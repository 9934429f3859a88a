"""Regression tests for the round-2 advisor findings (ADVICE.md round 2).

Each test pins a previously-wrong behavior:
- NUTS with ``adapt_step_size=False`` and no explicit ``step_size`` must use
  the automatically-searched step size instead of raising on ``None`` (both
  the monolithic and the chunked runner);
- ``chain_method`` must be honored ('sequential' host loop, 'parallel' ->
  sharded vectorized with a warning) or rejected (unknown values raise), and
  misspelled MCMC kwargs must raise instead of being swallowed;
- a ChEES kernel on a narrow bank must warn that its cross-chain trajectory
  adaptation is ineffective;
- feeding a warm start saved from one kernel type into the other must raise
  a clear "kernel mismatch" error instead of an opaque unpack failure.
"""

import warnings

import jax
import jax.numpy as jnp
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import MCMC, NUTS, handlers
from dynode_tpu.infer.chees import ChEES

OBS = jnp.asarray(
    [0.3, -0.1, 0.5, 0.2, 0.4, -0.2, 0.1, 0.6, 0.0, 0.35], dtype=jnp.float64
)


def normal_mean_model(obs_data=None):
    mu = handlers.sample("mu", dist.Normal(0.0, 5.0))
    handlers.sample("obs", dist.Normal(mu, 0.5), obs=obs_data)


class TestNoAdaptWithSearchedStepSize:
    """adapt_step_size=False + step_size=None used to raise TypeError after
    warmup in both NUTS paths (the ChEES path was fixed in round 2)."""

    def test_monolithic_path(self):
        mcmc = MCMC(
            NUTS(normal_mean_model, adapt_step_size=False, max_tree_depth=5),
            num_warmup=20,
            num_samples=20,
            num_chains=2,
        )
        mcmc.run(jax.random.PRNGKey(0), obs_data=OBS)
        mu = mcmc.get_samples()["mu"]
        assert mu.shape == (40,)
        assert bool(jnp.all(jnp.isfinite(mu)))
        # the searched step size must be finite and positive
        eps = mcmc.get_extra_fields(group_by_chain=True)["step_size"]
        assert bool(jnp.all(eps > 0.0)) and bool(jnp.all(jnp.isfinite(eps)))

    def test_chunked_path(self):
        mcmc = MCMC(
            NUTS(normal_mean_model, adapt_step_size=False, max_tree_depth=5),
            num_warmup=20,
            num_samples=20,
            num_chains=2,
            steps_per_call=10,
        )
        mcmc.run(jax.random.PRNGKey(0), obs_data=OBS)
        mu = mcmc.get_samples()["mu"]
        assert mu.shape == (40,)
        assert bool(jnp.all(jnp.isfinite(mu)))


class TestChainMethod:
    def test_sequential_matches_vectorized(self):
        kwargs = dict(num_warmup=30, num_samples=30, num_chains=2)
        vec = MCMC(NUTS(normal_mean_model), **kwargs)
        vec.run(jax.random.PRNGKey(7), obs_data=OBS)
        seq = MCMC(
            NUTS(normal_mean_model), chain_method="sequential", **kwargs
        )
        seq.run(jax.random.PRNGKey(7), obs_data=OBS)
        a = vec.get_samples(group_by_chain=True)["mu"]
        b = seq.get_samples(group_by_chain=True)["mu"]
        assert a.shape == b.shape == (2, 30)
        assert jnp.allclose(a, b, rtol=1e-6, atol=1e-8)

    def test_parallel_runs_sharded_with_warning(self):
        n_dev = len(jax.devices())
        mcmc = MCMC(
            NUTS(normal_mean_model),
            num_warmup=10,
            num_samples=10,
            num_chains=max(n_dev, 2),
            chain_method="parallel",
        )
        with pytest.warns(UserWarning, match="mesh-sharded vectorized"):
            mcmc.run(jax.random.PRNGKey(0), obs_data=OBS)
        assert mcmc.get_samples()["mu"].shape == (max(n_dev, 2) * 10,)
        if n_dev > 1:
            assert mcmc.mesh is not None

    def test_unknown_chain_method_raises(self):
        with pytest.raises(ValueError, match="chain_method"):
            MCMC(
                NUTS(normal_mean_model),
                num_warmup=5,
                num_samples=5,
                chain_method="parralel",  # the typo that used to be silent
            )

    def test_misspelled_kwarg_raises(self):
        with pytest.raises(TypeError):
            MCMC(
                NUTS(normal_mean_model),
                num_warmup=5,
                num_samples=5,
                steps_per_cal=10,  # typo: used to be **_ignored
            )

    def test_sequential_rejects_chees(self):
        with pytest.raises(ValueError, match="sequential"):
            mcmc = MCMC(
                ChEES(normal_mean_model),
                num_warmup=5,
                num_samples=5,
                num_chains=8,
                chain_method="sequential",
            )
            mcmc.run(jax.random.PRNGKey(0), obs_data=OBS)


class TestChEESNarrowBankWarning:
    def test_narrow_bank_warns(self):
        mcmc = MCMC(
            ChEES(normal_mean_model),
            num_warmup=10,
            num_samples=10,
            num_chains=2,
        )
        with pytest.warns(UserWarning, match="narrow banks"):
            mcmc.run(jax.random.PRNGKey(0), obs_data=OBS)

    def test_fixed_trajectory_does_not_warn(self):
        mcmc = MCMC(
            ChEES(normal_mean_model, trajectory_length=1.0),
            num_warmup=10,
            num_samples=10,
            num_chains=2,
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            mcmc.run(jax.random.PRNGKey(0), obs_data=OBS)

    def test_wide_bank_does_not_warn(self):
        mcmc = MCMC(
            ChEES(normal_mean_model),
            num_warmup=10,
            num_samples=10,
            num_chains=8,
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            mcmc.run(jax.random.PRNGKey(0), obs_data=OBS)


class TestWarmStartKernelMismatch:
    def test_nuts_state_into_chees_raises(self):
        nuts = MCMC(
            NUTS(normal_mean_model), num_warmup=10, num_samples=10,
            num_chains=8,
        )
        nuts.run(jax.random.PRNGKey(0), obs_data=OBS)
        ws = nuts.warm_start_state()
        chees = MCMC(
            ChEES(normal_mean_model), num_warmup=0, num_samples=10,
            num_chains=8,
        )
        with pytest.raises(ValueError, match="warm_start kernel mismatch"):
            chees.run(jax.random.PRNGKey(1), obs_data=OBS, warm_start=ws)

    def test_chees_state_into_nuts_raises(self):
        chees = MCMC(
            ChEES(normal_mean_model), num_warmup=10, num_samples=10,
            num_chains=8,
        )
        chees.run(jax.random.PRNGKey(0), obs_data=OBS)
        ws = chees.warm_start_state()
        nuts = MCMC(
            NUTS(normal_mean_model), num_warmup=0, num_samples=10,
            num_chains=8,
        )
        with pytest.raises(ValueError, match="warm_start kernel mismatch"):
            nuts.run(jax.random.PRNGKey(1), obs_data=OBS, warm_start=ws)
