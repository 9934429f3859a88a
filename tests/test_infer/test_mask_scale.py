"""handlers.mask / handlers.scale: weighted log-density contributions.

numpyro-parity handlers for missing data (surveillance series with
reporting gaps) and likelihood tempering. Masked entries may hold ANY
placeholder -- including NaN: weighted_log_prob double-wheres (in-support
fill before log_prob, zero after), so gradients stay finite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import MCMC, NUTS, handlers, log_likelihood
from dynode_tpu.infer.util import log_density


def test_mask_zeroes_masked_contributions():
    obs = jnp.array([1.0, 2.0, 3.0, 4.0])
    m = jnp.array([True, False, True, False])

    def model(obs=None):
        mu = handlers.sample("mu", dist.Normal(0.0, 10.0))
        with handlers.mask(m):
            handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)

    lj, _ = log_density(model, (), {"obs": obs}, {"mu": jnp.asarray(2.5)})
    want = (
        dist.Normal(0.0, 10.0).log_prob(jnp.asarray(2.5))
        + dist.Normal(2.5, 1.0).log_prob(obs[0])
        + dist.Normal(2.5, 1.0).log_prob(obs[2])
    )
    np.testing.assert_allclose(float(lj), float(want), rtol=1e-6)


def test_nested_masks_compose_with_and():
    m1 = jnp.array([True, True, False, False])
    m2 = jnp.array([True, False, True, False])

    def model():
        with handlers.mask(m1), handlers.mask(m2):
            handlers.sample(
                "obs", dist.Normal(0.0, 1.0), obs=jnp.zeros(4)
            )

    with handlers.trace() as tr, handlers.seed(0):
        model()
    np.testing.assert_array_equal(
        np.asarray(tr["obs"]["mask"]), [True, False, False, False]
    )


def test_scale_multiplies_and_nests():
    def model():
        with handlers.scale(2.0), handlers.scale(3.0):
            handlers.sample(
                "obs", dist.Normal(0.0, 1.0), obs=jnp.zeros(())
            )

    lj, tr = log_density(model, (), {}, {})
    assert tr["obs"]["scale"] == pytest.approx(6.0)
    want = 6.0 * float(dist.Normal(0.0, 1.0).log_prob(jnp.zeros(())))
    assert float(lj) == pytest.approx(want, rel=1e-6)


def test_masked_gradient_ignores_dummy_entries():
    # masked-out entries hold dummy values; the potential's gradient must
    # not see them at all
    obs = jnp.array([1.0, 2.0, 100.0, -50.0])
    m = jnp.array([True, True, False, False])

    def lj(mu):
        def model():
            with handlers.mask(m):
                handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)

        return log_density(model, (), {}, {})[0]

    g = jax.grad(lj)(jnp.asarray(1.5))
    # d/dmu sum_i m_i * (obs_i - mu) = (1.0 - 1.5) + (2.0 - 1.5)
    np.testing.assert_allclose(float(g), 0.0, atol=1e-6)
    g2 = jax.grad(lj)(jnp.asarray(0.0))
    np.testing.assert_allclose(float(g2), 3.0, rtol=1e-6)


TRUE_MU = 3.0


def _masked_model(obs=None, m=None):
    mu = handlers.sample("mu", dist.Normal(0.0, 10.0))
    with handlers.mask(m):
        handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)


def test_nuts_missing_data_fit():
    rng = np.random.default_rng(0)
    good = rng.normal(TRUE_MU, 1.0, 100)
    obs = jnp.asarray(np.concatenate([good, np.full(100, -99.0)]))
    m = jnp.asarray(np.arange(200) < 100)
    mcmc = MCMC(NUTS(_masked_model), num_warmup=150, num_samples=150,
                num_chains=4)
    mcmc.run(jax.random.PRNGKey(0), obs=obs, m=m)
    mu = np.asarray(mcmc.get_samples()["mu"], dtype=np.float64)
    # the -99 dummies are invisible: posterior matches the observed half
    np.testing.assert_allclose(mu.mean(), good.mean(), atol=0.3)


def test_scale_tempering_matches_conjugate_posterior():
    # Normal likelihood with known sigma=1, prior Normal(0, 10^2), n obs,
    # likelihood tempered by s: posterior var = 1/(1/100 + s*n)
    rng = np.random.default_rng(1)
    obs_np = rng.normal(TRUE_MU, 1.0, 50)
    obs = jnp.asarray(obs_np)
    s = 4.0

    def model(obs=None):
        mu = handlers.sample("mu", dist.Normal(0.0, 10.0))
        with handlers.scale(s):
            handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)

    mcmc = MCMC(NUTS(model), num_warmup=200, num_samples=400, num_chains=4)
    mcmc.run(jax.random.PRNGKey(0), obs=obs)
    mu = np.asarray(mcmc.get_samples()["mu"], dtype=np.float64)
    var_want = 1.0 / (1.0 / 100.0 + s * len(obs_np))
    mean_want = var_want * s * obs_np.sum()
    np.testing.assert_allclose(mu.mean(), mean_want, atol=0.05)
    np.testing.assert_allclose(
        mu.std(), np.sqrt(var_want), rtol=0.25
    )


def test_log_likelihood_zeroes_masked_entries():
    obs = jnp.array([1.0, 2.0, 3.0, 4.0])
    m = jnp.array([True, False, True, False])
    draws = {"mu": jnp.asarray([0.5, 1.5])}
    ll = log_likelihood(_masked_model, draws, obs=obs, m=m)["obs"]
    assert ll.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(ll[:, 1]), 0.0)
    np.testing.assert_array_equal(np.asarray(ll[:, 3]), 0.0)
    np.testing.assert_allclose(
        np.asarray(ll[0, 0]),
        float(dist.Normal(0.5, 1.0).log_prob(obs[0])),
        rtol=1e-6,
    )


def test_svi_with_masked_obs():
    from dynode_tpu.infer import SVI, Adam, AutoNormal, Trace_ELBO

    rng = np.random.default_rng(2)
    good = rng.normal(TRUE_MU, 1.0, 100)
    obs = jnp.asarray(np.concatenate([good, np.full(100, -99.0)]))
    m = jnp.asarray(np.arange(200) < 100)
    guide = AutoNormal(_masked_model)
    svi = SVI(_masked_model, guide, Adam(0.1), Trace_ELBO())
    res = svi.run(jax.random.PRNGKey(0), 600, obs=obs, m=m)
    loc = float(np.asarray(res.params["auto_loc"]).squeeze())
    np.testing.assert_allclose(loc, good.mean(), atol=0.3)


def test_masked_nan_observations_have_finite_gradients():
    """Double-where regression: NaN-encoded reporting gaps behind a mask
    must not poison gradients (where's VJP turns 0 * d log_prob(NaN) into
    NaN without the in-support fill)."""
    import jax

    data = jnp.array([1.2, jnp.nan, 0.8])
    m = jnp.array([True, False, True])

    def model(obs):
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        with handlers.mask(m):
            handlers.sample("x", dist.Normal(mu, 0.5), obs=obs)

    from dynode_tpu.infer.util import log_density

    def potential(mu_val):
        lp, _ = log_density(model, (data,), {}, {"mu": mu_val})
        return -lp

    g = jax.grad(potential)(jnp.asarray(0.3))
    assert jnp.isfinite(g), g
    # forward density equals the unmasked two-point density
    lp_masked = -potential(jnp.asarray(0.3))
    lp_direct = (
        dist.Normal(0.3, 0.5).log_prob(jnp.array([1.2, 0.8])).sum()
        + dist.Normal(0.0, 1.0).log_prob(jnp.asarray(0.3))
    )
    assert jnp.allclose(lp_masked, lp_direct, atol=1e-5)


def test_masked_discrete_nan_safe_fill():
    """Count likelihoods: the in-support fill for discrete supports is 0."""
    import jax

    data = jnp.array([3.0, jnp.nan])
    m = jnp.array([True, False])

    def model(obs):
        rate = handlers.sample("rate", dist.LogNormal(0.0, 1.0))
        with handlers.mask(m):
            handlers.sample("y", dist.Poisson(rate), obs=obs)

    from dynode_tpu.infer.util import log_density

    def potential(r):
        lp, _ = log_density(model, (data,), {}, {"rate": r})
        return -lp

    assert jnp.isfinite(jax.grad(potential)(jnp.asarray(2.0)))
