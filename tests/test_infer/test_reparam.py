"""handlers.reparam + LocScaleReparam/TransformReparam (numpyro parity).

Non-centered parameterizations: the joint density moves to an auxiliary
site (``x_decentered`` / ``x_base``) and the original site becomes a
zero-density Delta at the recomputed value. Pins trace structure, density
bookkeeping, plate composition, end-to-end NUTS (including Neal's funnel,
where the centered geometry is the textbook failure), and Predictive
recovery of the original site.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.dist.distribution import Delta
from dynode_tpu.infer import (
    MCMC,
    NUTS,
    LocScaleReparam,
    Predictive,
    TransformReparam,
    handlers,
)
from dynode_tpu.infer.util import latent_sites, log_density


def test_trace_structure_and_density():
    def model(obs=None):
        with handlers.reparam({"x": LocScaleReparam()}):
            x = handlers.sample("x", dist.Normal(5.0, 2.0))
        handlers.sample("obs", dist.Normal(x, 1.0), obs=obs)

    obs = jnp.asarray(6.0)
    z = jnp.asarray(0.7)
    lj, tr = log_density(model, (), {"obs": obs}, {"x_decentered": z})
    assert isinstance(tr["x"]["fn"], Delta)
    assert "x_decentered" in tr
    x = 5.0 + 2.0 * 0.7
    want = (
        dist.Normal(0.0, 1.0).log_prob(z)
        + dist.Normal(x, 1.0).log_prob(obs)
    )
    np.testing.assert_allclose(float(lj), float(want), rtol=1e-6)
    # only the auxiliary site is a latent; the Delta site is excluded
    assert set(latent_sites(tr)) == {"x_decentered"}
    np.testing.assert_allclose(float(tr["x"]["value"]), x, rtol=1e-6)


def test_centered_one_is_identity_geometry():
    def model():
        with handlers.reparam({"x": LocScaleReparam(centered=1.0)}):
            return handlers.sample("x", dist.Normal(5.0, 2.0))

    with handlers.trace() as tr, handlers.seed(0):
        x = model()
    z = tr["x_decentered"]["value"]
    np.testing.assert_allclose(float(x), float(z), rtol=1e-6)
    base = tr["x_decentered"]["fn"]
    np.testing.assert_allclose(float(base.loc), 5.0)
    np.testing.assert_allclose(float(base.scale), 2.0)


def test_reparam_composes_with_plate():
    def model():
        with handlers.reparam({"x": LocScaleReparam()}):
            with handlers.plate("strain", 3):
                return handlers.sample("x", dist.Normal(1.0, 0.5))

    with handlers.trace() as tr, handlers.seed(0):
        x = model()
    assert x.shape == (3,)
    assert tr["x_decentered"]["value"].shape == (3,)
    # independent auxiliary draws
    assert len(np.unique(np.asarray(tr["x_decentered"]["value"]))) == 3


def test_locscale_rejects_non_normal():
    with pytest.raises(TypeError, match="LocScaleReparam supports Normal"):
        with handlers.seed(0), handlers.reparam(
            {"x": LocScaleReparam()}
        ):
            handlers.sample("x", dist.HalfNormal(1.0))


def _funnel_model():
    # Neal's funnel: the centered geometry needs step sizes spanning
    # exp(+-3 sigma_y/2); non-centered is isotropic
    with handlers.reparam(
        {"x": LocScaleReparam()}
    ):
        y = handlers.sample("y", dist.Normal(0.0, 3.0))
        with handlers.plate("d", 4):
            handlers.sample("x", dist.Normal(0.0, jnp.exp(y / 2.0)))


def test_noncentered_funnel_recovers_prior_marginal():
    m = MCMC(NUTS(_funnel_model), num_warmup=300, num_samples=300,
             num_chains=8)
    m.run(jax.random.PRNGKey(0))
    y = np.asarray(m.get_samples()["y"], dtype=np.float64)
    # the y-marginal IS Normal(0, 3); a funnel-stuck sampler
    # under-disperses it badly (classic failure: std ~ 1)
    assert abs(y.mean()) < 0.5, y.mean()
    assert 2.5 < y.std() < 3.5, y.std()


def test_nuts_equivalence_centered_vs_noncentered():
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.normal(2.0, 1.0, 50))

    def centered(obs=None):
        x = handlers.sample("x", dist.Normal(0.0, 10.0))
        handlers.sample("obs", dist.Normal(x, 1.0), obs=obs)

    def noncentered(obs=None):
        with handlers.reparam({"x": LocScaleReparam()}):
            x = handlers.sample("x", dist.Normal(0.0, 10.0))
        handlers.sample("obs", dist.Normal(x, 1.0), obs=obs)

    mc = MCMC(NUTS(centered), num_warmup=200, num_samples=300, num_chains=4)
    mc.run(jax.random.PRNGKey(0), obs=obs)
    mn = MCMC(NUTS(noncentered), num_warmup=200, num_samples=300,
              num_chains=4)
    mn.run(jax.random.PRNGKey(0), obs=obs)
    xc = np.asarray(mc.get_samples()["x"], dtype=np.float64)
    zd = np.asarray(mn.get_samples()["x_decentered"], dtype=np.float64)
    xn = 0.0 + 10.0 * zd  # recompute the site from its auxiliary
    np.testing.assert_allclose(xc.mean(), xn.mean(), atol=0.1)
    np.testing.assert_allclose(xc.std(), xn.std(), rtol=0.25)


def test_predictive_recovers_reparam_site():
    def model(obs=None):
        with handlers.reparam({"x": LocScaleReparam()}):
            x = handlers.sample("x", dist.Normal(0.0, 10.0))
        handlers.sample("obs", dist.Normal(x, 1.0), obs=obs)

    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.normal(-3.0, 1.0, 80))
    m = MCMC(NUTS(model), num_warmup=150, num_samples=150, num_chains=4)
    m.run(jax.random.PRNGKey(0), obs=obs)
    pred = Predictive(model, posterior_samples=m.get_samples())(
        jax.random.PRNGKey(1)
    )
    # the Delta site is replayed from x_decentered and returned
    x = np.asarray(pred["x"], dtype=np.float64)
    np.testing.assert_allclose(x.mean(), -3.0, atol=0.3)


def test_transform_reparam_flagship_prior():
    # the flagship example's r0 prior (sir_infer_parameters.py)
    prior = dist.TransformedDistribution(
        dist.Beta(0.5, 0.5), dist.AffineTransform(1.5, 1.0)
    )

    def model(obs=None):
        with handlers.reparam({"r0": TransformReparam()}):
            r0 = handlers.sample("r0", prior)
        handlers.sample("obs", dist.Normal(r0, 0.1), obs=obs)

    with handlers.trace() as tr, handlers.seed(0):
        model()
    assert "r0_base" in tr
    assert isinstance(tr["r0"]["fn"], Delta)
    b = float(tr["r0_base"]["value"])
    np.testing.assert_allclose(float(tr["r0"]["value"]), 1.5 + b, rtol=1e-6)

    rng = np.random.default_rng(2)
    obs = jnp.asarray(rng.normal(2.2, 0.1, 60))
    m = MCMC(NUTS(model), num_warmup=200, num_samples=200, num_chains=4)
    m.run(jax.random.PRNGKey(0), obs=obs)
    base = np.asarray(m.get_samples()["r0_base"], dtype=np.float64)
    np.testing.assert_allclose((1.5 + base).mean(), 2.2, atol=0.05)
