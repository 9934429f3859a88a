"""Production-family posterior parity against an exact quadrature oracle.

Round 4 closed BASELINE.md's 1% criterion non-circularly for the flagship
SIR fit (tests/golden/gen_quadrature.py). This module extends the witness
to the PRODUCTION model family: a reduced-rank SEIP configuration with
every mechanism of the full model active -- immune-history strata, ordinal
vaccination with the seasonal sin^1000 reset pulse INSIDE the fit window,
waning chain with partial protections, external strain introduction
(normal-mixing pulse), seasonal transmission forcing, layered immunity --
sized so an exact 2-D grid quadrature (scipy DOP853 at rtol 1e-8; shares
the repo's RHS but NOT its solver, distributions, or samplers) and a
CPU ChEES fit both run in CI time.

Golden: tests/golden/seip_quadrature.npz (gen_seip_quadrature.py).
The observed dataset itself is pinned inside the golden so a jax PRNG
change breaks the test loudly instead of silently shifting the target.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu import simulate
from dynode_tpu.config import SolverParams, Strain
from dynode_tpu.infer import MCMC, ChEES, handlers
from dynode_tpu.models.seip import (
    seip_config,
    seip_initial_state,
    seip_ode,
    seip_odeparams,
)

GOLDEN = pathlib.Path(__file__).parents[1] / "golden" / "seip_quadrature.npz"

# ---- the canonical reduced-rank oracle fit (shared with the generator) ----
FIT_DAYS = 50
INTRO_DAY = 25.0
DT = 1.0
TRUE_SCALES = (1.1, 0.9)
PRIOR_LOC, PRIOR_SCALE, PRIOR_LO, PRIOR_HI = 1.0, 0.2, 0.5, 1.8
_MAX_VAX = 1


def build_fit():
    """(cfg, base, y0, sp) for the canonical reduced-rank SEIP fit."""
    strains = [
        Strain(
            strain_name="alpha",
            r0=2.2,
            infectious_period=7.0,
            exposed_to_infectious=3.6,
            vaccine_efficacy={
                k: min(0.35 * k, 0.8) for k in range(_MAX_VAX + 2)
            },
        ),
        Strain(
            strain_name="delta",
            r0=3.0,
            infectious_period=7.0,
            exposed_to_infectious=3.6,
            vaccine_efficacy={
                k: min(0.30 * k, 0.7) for k in range(_MAX_VAX + 2)
            },
            is_introduced=True,
            introduction_time=INTRO_DAY,
            introduction_percentage=0.02,
            introduction_scale=3.0,
        ),
    ]
    cfg = seip_config(
        strains=strains,
        n_age=2,
        age_edges=(0, 50, 99),
        age_demographics=(0.6, 0.4),
        max_vaccinations=_MAX_VAX,
        seasonal_vaccination=True,
        vaccination_season_change_day=30.0,  # sin^1000 pulse inside window
        waning_times=(40.0, float("inf")),
        waning_protections=(1.0, 0.7),
        solver_params=SolverParams(constant_step_size=DT),
    )
    base = seip_odeparams(cfg)
    y0 = seip_initial_state(cfg)
    return cfg, base, y0, cfg.parameters.solver_params


def incidence_curve(base, y0, sp, scales):
    p = base.replace(beta=base.beta * jnp.asarray(scales))
    sol = simulate(seip_ode, FIT_DAYS, y0, p, sp, sub_save_indices=(3,))
    cum = jnp.sum(sol.ys[3], axis=(1, 2, 3))  # (FIT_DAYS+1, n_strains)
    return jnp.maximum(jnp.diff(cum, axis=0), 1e-6)


def make_obs(base, y0, sp):
    curve = incidence_curve(base, y0, sp, jnp.asarray(TRUE_SCALES))
    return jax.random.poisson(jax.random.PRNGKey(0), curve).astype(
        jnp.result_type(float)
    )


def make_model(base, y0, sp):
    n = base.beta.shape[0]
    prior = dist.TruncatedNormal(
        loc=PRIOR_LOC * jnp.ones(n),
        scale=PRIOR_SCALE * jnp.ones(n),
        low=PRIOR_LO,
        high=PRIOR_HI,
    )

    def model(obs_data=None):
        scales = handlers.sample("beta_scales", prior)
        inc = incidence_curve(base, y0, sp, scales)
        handlers.sample("obs", dist.Poisson(inc), obs=obs_data)

    return model


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():
        pytest.skip("seip_quadrature.npz not generated")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def fit_pieces():
    cfg, base, y0, sp = build_fit()
    return cfg, base, y0, sp


def test_observed_dataset_is_pinned(golden, fit_pieces):
    """Regenerated obs must equal the golden's (PRNG/solve provenance)."""
    _, base, y0, sp = fit_pieces
    obs = np.asarray(make_obs(base, y0, sp))
    np.testing.assert_array_equal(obs, golden["obs"])


def test_chees_matches_quadrature_posterior(golden, fit_pieces):
    """ChEES through the full SEIP mechanics lands on the exact posterior.

    Tolerance: 1% of the parameter value (the BASELINE criterion) or five
    combined Monte-Carlo/quadrature standard errors, whichever is larger.
    """
    _, base, y0, sp = fit_pieces
    obs = jnp.asarray(golden["obs"])
    model = make_model(base, y0, sp)
    mcmc = MCMC(
        ChEES(model, max_num_steps=8),
        num_warmup=50,
        num_samples=150,
        num_chains=8,
        progress_bar=False,
    )
    mcmc.run(jax.random.PRNGKey(11), obs_data=obs)
    arr = np.asarray(mcmc.get_samples(group_by_chain=True)["beta_scales"])
    flat = arr.reshape(-1, arr.shape[-1])
    q_mean = golden["mean"]
    q_std = golden["std"]
    for k in range(flat.shape[-1]):
        from dynode_tpu.infer.diagnostics import effective_sample_size

        ess = max(effective_sample_size(arr[:, :, k]), 8.0)
        mc_err = float(q_std[k]) / np.sqrt(ess)
        tol = max(0.01 * abs(q_mean[k]), 5.0 * mc_err)
        assert abs(flat[:, k].mean() - q_mean[k]) < tol, (
            k, flat[:, k].mean(), q_mean[k], tol,
        )
        # spread agreement: within 25% of the exact posterior sd
        assert 0.75 * q_std[k] < flat[:, k].std() < 1.25 * q_std[k], (
            k, flat[:, k].std(), q_std[k],
        )


def test_quadrature_mass_is_contained(golden):
    """The golden itself must certify its integration quality."""
    assert float(golden["edge_mass"]) < 1e-8
    assert float(golden["coarse_mode_on_boundary"]) == 0.0
