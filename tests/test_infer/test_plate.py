"""handlers.plate: conditionally independent batch dims (numpyro parity).

The reference's model-authoring surface is numpyro, whose users write
plated models -- its own utils exist to post-process them
(/root/reference/src/dynode/utils/utils.py:45-61 ``flatten_list_parameters``
"Flatten plated parameters into separate keys"). These tests pin:

- shape semantics: single plate, nesting (right-to-left dims), explicit
  ``dim=``, broadcasting against an existing batch shape;
- independence of draws across the plate dim;
- the joint density matching a hand-computed sum;
- end-to-end inference (NUTS + SVI + Predictive) through a plated model,
  including the ``flatten_list_parameters`` round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import MCMC, NUTS, Predictive, handlers
from dynode_tpu.infer.util import log_density
from dynode_tpu.utils import flatten_list_parameters


def test_single_plate_shapes():
    def model():
        with handlers.plate("strain", 3):
            x = handlers.sample("x", dist.Normal(0.0, 1.0))
        return x

    with handlers.trace() as tr, handlers.seed(0):
        x = model()
    assert x.shape == (3,)
    assert tr["x"]["fn"].batch_shape == (3,)
    assert tr["x"]["cond_indep_stack"] == [("strain", 3, -1)]


def test_nested_plates_stack_right_to_left():
    def model():
        with handlers.plate("age", 4):
            with handlers.plate("strain", 3):
                x = handlers.sample("x", dist.Normal(0.0, 1.0))
        return x

    with handlers.seed(0):
        x = model()
    # outer plate allocated dim -1 first; inner takes the next free (-2)
    assert x.shape == (3, 4)


def test_explicit_dim():
    def model():
        with handlers.plate("age", 4, dim=-2):
            x = handlers.sample("x", dist.Normal(0.0, 1.0))
        return x

    with handlers.seed(0):
        x = model()
    assert x.shape == (4, 1)


def test_plate_broadcasts_existing_batch_shape():
    locs = jnp.array([0.0, 10.0, 20.0])

    def model():
        with handlers.plate("strain", 3):
            return handlers.sample("x", dist.Normal(locs, 0.01))

    with handlers.seed(0):
        x = model()
    assert x.shape == (3,)
    np.testing.assert_allclose(np.asarray(x), [0.0, 10.0, 20.0], atol=0.1)


def test_plate_draws_are_independent():
    def model():
        with handlers.plate("strain", 64):
            return handlers.sample("x", dist.Normal(0.0, 1.0))

    with handlers.seed(0):
        x = np.asarray(model())
    assert len(np.unique(x)) == 64
    assert np.std(x) > 0.5


def test_dim_collision_and_subsample_rejected():
    with pytest.raises(ValueError, match="already taken"):
        with handlers.plate("a", 2, dim=-1), handlers.plate("b", 3, dim=-1):
            pass
    with pytest.raises(NotImplementedError, match="subsampling"):
        handlers.plate("a", 10, subsample_size=5)
    with pytest.raises(ValueError, match="negative"):
        handlers.plate("a", 2, dim=0)


def test_auto_dim_resets_on_reuse():
    p = handlers.plate("strain", 3)
    with p:
        assert p.dim == -1
    with handlers.plate("age", 4):  # occupies -1
        with p:
            assert p.dim == -2
    with p:
        assert p.dim == -1


def test_log_density_matches_hand_sum():
    obs = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])  # (strain=3, t=2)

    def model(obs=None):
        with handlers.plate("strain", 3, dim=-2):
            mu = handlers.sample("mu", dist.Normal(0.0, 10.0))  # (3, 1)
            handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)

    mu = jnp.array([[1.5], [3.5], [5.5]])
    lj, tr = log_density(model, (), {"obs": obs}, {"mu": mu})
    want = (
        dist.Normal(0.0, 10.0).log_prob(mu).sum()
        + dist.Normal(mu, 1.0).log_prob(obs).sum()
    )
    np.testing.assert_allclose(float(lj), float(want), rtol=1e-6)
    assert tr["mu"]["value"].shape == (3, 1)


def _plated_model(obs=None):
    with handlers.plate("strain", 3):
        mu = handlers.sample("mu", dist.Normal(0.0, 10.0))
    handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)


TRUE_MU = np.array([-2.0, 1.0, 4.0])


def _make_obs(n=200):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(TRUE_MU, 1.0, (n, 3)))


def test_nuts_recovers_plated_means():
    obs = _make_obs()
    m = MCMC(NUTS(_plated_model), num_warmup=150, num_samples=150, num_chains=4)
    m.run(jax.random.PRNGKey(0), obs=obs)
    mu = np.asarray(m.get_samples()["mu"])  # (draws, 3)
    assert mu.shape[-1] == 3
    np.testing.assert_allclose(mu.mean(0), TRUE_MU, atol=0.25)

    # the reference's post-processing of plated samples round-trips
    grouped = m.get_samples(group_by_chain=True)
    flat = flatten_list_parameters({"mu": np.asarray(grouped["mu"])})
    assert set(flat) == {"mu_0", "mu_1", "mu_2"}
    np.testing.assert_allclose(
        flat["mu_1"].mean(), mu[:, 1].mean(), rtol=1e-6
    )


def test_predictive_through_plated_model():
    obs = _make_obs()
    m = MCMC(NUTS(_plated_model), num_warmup=100, num_samples=100, num_chains=2)
    m.run(jax.random.PRNGKey(0), obs=obs)
    pred = Predictive(_plated_model, posterior_samples=m.get_samples())(
        jax.random.PRNGKey(1)
    )
    assert pred["obs"].shape[-1] == 3
    np.testing.assert_allclose(
        np.asarray(pred["obs"]).mean(0), TRUE_MU, atol=0.3
    )


def test_svi_through_plated_model():
    from dynode_tpu.infer import SVI, Adam, AutoNormal

    obs = _make_obs()
    guide = AutoNormal(_plated_model)
    svi = SVI(_plated_model, guide, Adam(0.05))
    res = svi.run(jax.random.PRNGKey(0), 500, obs=obs)
    post = Predictive(guide, params=res.params, num_samples=500)(
        jax.random.PRNGKey(1), obs=obs
    )
    mu = np.asarray(post["mu"])
    assert mu.shape == (500, 3)
    np.testing.assert_allclose(mu.mean(0), TRUE_MU, atol=0.3)


def test_sample_shape_respected_under_handlers():
    # sample_shape used to be silently dropped when a handler stack was
    # active (the no-stack path honored it); pin the handled path too
    with handlers.trace() as tr, handlers.seed(0):
        x = handlers.sample("x", dist.Normal(0.0, 1.0), sample_shape=(5,))
    assert x.shape == (5,)
    assert tr["x"]["value"].shape == (5,)


def test_sample_shape_composes_with_plate():
    def model():
        with handlers.plate("strain", 3):
            return handlers.sample(
                "x", dist.Normal(0.0, 1.0), sample_shape=(5,)
            )

    with handlers.seed(0):
        x = model()
    assert x.shape == (5, 3)
