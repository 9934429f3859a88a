"""SVI-initialized ChEES (chees_warm_start_from_guide).

The helper converts a fitted autoguide into an ``MCMC.run(warm_start=)``
value: guide draws as chain positions, guide covariance as the inverse
mass matrix, optimal-scaling defaults for step size / trajectory. These
tests pin
- posterior correctness against a conjugate normal-normal oracle with
  ZERO warmup transitions (the whole point of the feature),
- the guide<->sampler flat-layout contract on a multi-site model with a
  vector latent (both sides ravel sorted site-name dicts),
- the guide-type dispatch (MVN dense mass / AutoNormal diag /
  AutoDelta jitter requirement) and the override knobs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import (
    MCMC,
    SVI,
    Adam,
    AutoDelta,
    AutoMultivariateNormal,
    AutoNormal,
    ChEES,
    Trace_ELBO,
    chees_warm_start_from_guide,
    handlers,
)

PRIOR_MU, PRIOR_SD = 0.0, 3.0
NOISE_SD = 1.0


def _make_obs(n=40, true_mu=1.3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(true_mu + NOISE_SD * rng.standard_normal(n))


def _conjugate(obs):
    n = obs.shape[0]
    prec = 1.0 / PRIOR_SD**2 + n / NOISE_SD**2
    mean = (PRIOR_MU / PRIOR_SD**2 + float(jnp.sum(obs)) / NOISE_SD**2) / prec
    return mean, 1.0 / np.sqrt(prec)


def normal_model(obs=None):
    mu = handlers.sample("mu", dist.Normal(PRIOR_MU, PRIOR_SD))
    handlers.sample("obs", dist.Normal(mu, NOISE_SD), obs=obs)


def _fit_guide(guide_cls, obs, num_steps=400):
    guide = guide_cls(normal_model)
    svi = SVI(normal_model, guide, Adam(step_size=0.05), Trace_ELBO())
    res = svi.run(jax.random.PRNGKey(1), num_steps=num_steps, obs=obs)
    return guide, res.params


def _run_warm_chees(obs, warm, num_chains, num_samples=60, burn=10):
    mcmc = MCMC(
        ChEES(normal_model),
        num_warmup=0,
        num_samples=num_samples,
        num_chains=num_chains,
        progress_bar=False,
    )
    mcmc.run(jax.random.PRNGKey(2), obs=obs, warm_start=warm)
    draws = np.asarray(
        mcmc.get_samples(group_by_chain=True)["mu"], dtype=np.float64
    )
    return draws[:, burn:], mcmc


@pytest.mark.parametrize("guide_cls", [AutoMultivariateNormal, AutoNormal])
def test_zero_warmup_recovers_conjugate_posterior(guide_cls):
    obs = _make_obs()
    true_mean, true_sd = _conjugate(obs)
    guide, params = _fit_guide(guide_cls, obs)
    warm = chees_warm_start_from_guide(
        guide, params, num_chains=64, rng_key=jax.random.PRNGKey(3)
    )
    draws, _ = _run_warm_chees(obs, warm, num_chains=64)
    ess_floor = 200.0  # far below the true bank ESS; loose MC error bound
    assert abs(draws.mean() - true_mean) < 5.0 * true_sd / np.sqrt(ess_floor)
    assert abs(draws.std() - true_sd) < 0.25 * true_sd


def test_chains_actually_move():
    # the MH kernel must accept at the defaults (a broken eps would leave
    # the bank frozen at its guide draws)
    obs = _make_obs()
    guide, params = _fit_guide(AutoMultivariateNormal, obs)
    warm = chees_warm_start_from_guide(
        guide, params, num_chains=32, rng_key=jax.random.PRNGKey(3)
    )
    draws, _ = _run_warm_chees(obs, warm, num_chains=32, burn=0)
    moved = np.mean(np.abs(np.diff(draws, axis=1)) > 1e-12)
    assert moved > 0.3, f"only {moved:.0%} of transitions moved"


def multisite_model(obs=None):
    # sorted site order: a_rate < m_loc < obs -- a vector site and a scalar
    # site on either side alphabetically pins the ravel layout contract
    rates = handlers.sample(
        "a_rate", dist.LogNormal(jnp.zeros(3), jnp.ones(3))
    )
    m = handlers.sample("m_loc", dist.Normal(0.0, 2.0))
    pred = m + jnp.log(rates)
    handlers.sample("obs", dist.Normal(pred, 0.3), obs=obs)


def test_flat_layout_contract_multisite():
    true_m = 0.7
    true_rates = np.array([0.5, 1.0, 2.0])
    obs = jnp.asarray(true_m + np.log(true_rates))
    guide = AutoMultivariateNormal(multisite_model)
    svi = SVI(multisite_model, guide, Adam(step_size=0.05), Trace_ELBO())
    params = svi.run(
        jax.random.PRNGKey(4), num_steps=600, obs=obs
    ).params
    warm = chees_warm_start_from_guide(
        guide, params, num_chains=64, rng_key=jax.random.PRNGKey(5)
    )
    mcmc = MCMC(
        ChEES(multisite_model),
        num_warmup=0,
        num_samples=60,
        num_chains=64,
        progress_bar=False,
    )
    mcmc.run(jax.random.PRNGKey(6), obs=obs, warm_start=warm)
    post = mcmc.get_samples()
    # a layout mix-up would scramble which flat slot feeds which site; the
    # identified combination m + log(rate_i) then cannot match the data.
    # (Compare per-draw means: log of the mean rate would add a Jensen gap.)
    per_draw = np.asarray(post["m_loc"], dtype=np.float64)[:, None] + np.log(
        np.asarray(post["a_rate"], dtype=np.float64)
    )
    np.testing.assert_allclose(per_draw.mean(axis=0), np.asarray(obs), atol=0.2)


def test_autodelta_requires_jitter_and_works_with_it():
    obs = _make_obs()
    guide, params = _fit_guide(AutoDelta, obs, num_steps=300)
    with pytest.raises(ValueError, match="init_jitter"):
        chees_warm_start_from_guide(
            guide, params, num_chains=16, rng_key=jax.random.PRNGKey(3)
        )
    warm = chees_warm_start_from_guide(
        guide,
        params,
        num_chains=64,
        rng_key=jax.random.PRNGKey(3),
        init_jitter=0.1,
    )
    state, (inv_mass, chol, eps, traj) = warm
    assert inv_mass.ndim == 1  # identity diag: Delta has no covariance
    # chains must not be identical
    assert float(np.std(np.asarray(state.z[:, 0]))) > 1e-3
    draws, _ = _run_warm_chees(obs, warm, num_chains=64)
    true_mean, true_sd = _conjugate(obs)
    assert abs(draws.mean() - true_mean) < 0.2


def test_overrides_and_unfitted_guide():
    obs = _make_obs()
    guide, params = _fit_guide(AutoNormal, obs, num_steps=200)
    warm = chees_warm_start_from_guide(
        guide,
        params,
        num_chains=8,
        rng_key=jax.random.PRNGKey(3),
        step_size=0.123,
        trajectory_length=0.9,
    )
    _, (_, _, eps, traj) = warm
    assert float(eps) == pytest.approx(0.123)
    assert float(traj) == pytest.approx(0.9)
    fresh = AutoNormal(normal_model)
    with pytest.raises(ValueError, match="fit it first"):
        chees_warm_start_from_guide(
            fresh, params, num_chains=8, rng_key=jax.random.PRNGKey(3)
        )
