"""SEIRS endemic equilibrium + seasonal-forcing oracles
(spec: reference tests/test_seirs_dynamics/ and
tests/test_seirs_seasonality_dynamics/).

Closed-form SEIRS endemic equilibrium (fractions of N):
  s* = 1/R0
  i* = (1 - 1/R0) / (1 + gamma/omega + gamma/sigma)  [derived from flow balance]
  e* = (gamma/sigma) i* ;  r* = (gamma/omega) i*
"""

import jax.numpy as jnp
import numpy as np

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seirs import (
    seirs_config,
    seirs_ode,
    seirs_odeparams,
    seirs_seasonal_config,
    seirs_seasonal_ode,
)

N = 1000.0
R0, INF_P, LAT_P, WANE_P = 2.0, 7.0, 3.0, 60.0


def _run(days=2500):
    cfg = seirs_config(
        r_0=R0,
        infectious_period=INF_P,
        latent_period=LAT_P,
        waning_period=WANE_P,
        solver_params=SolverParams(step_budget=1024),
    )
    return simulate(
        seirs_ode,
        days,
        cfg.initializer.get_initial_state(),
        seirs_odeparams(cfg),
        cfg.parameters.solver_params,
    )


def _equilibrium():
    gamma, sigma, omega = 1.0 / INF_P, 1.0 / LAT_P, 1.0 / WANE_P
    s_star = 1.0 / R0
    i_star = (1.0 - s_star) / (1.0 + gamma / omega + gamma / sigma)
    e_star = (gamma / sigma) * i_star
    r_star = (gamma / omega) * i_star
    return np.array([s_star, e_star, i_star, r_star]) * N


def test_reaches_equilibrium_and_matches_theory():
    sol = _run()
    series = [np.asarray(a).squeeze() for a in sol.ys]
    # settled: negligible variation over the final 100 days
    for x in series:
        assert x[-100:].std() < 1e-3
    finals = np.array([x[-1] for x in series])
    expected = _equilibrium()
    np.testing.assert_allclose(finals, expected, rtol=1e-2)


def test_mass_conserved():
    sol = _run(days=800)
    total = sum(np.asarray(a).squeeze() for a in sol.ys)
    np.testing.assert_allclose(total, N, rtol=1e-9)


def test_seasonal_forcing_sustains_oscillation():
    cfg = seirs_seasonal_config(
        seasonal_amplitude=0.2,
        solver_params=SolverParams(step_budget=2048),
    )
    sol = simulate(
        seirs_seasonal_ode,
        4 * 365,
        cfg.initializer.get_initial_state(),
        seirs_odeparams(cfg, seasonal=True),
        cfg.parameters.solver_params,
    )
    i = np.asarray(sol.ys[2]).squeeze()
    # unlike the unforced model, infections keep oscillating at t -> inf
    assert i[-365:].std() > 1e-4
    # annual periodicity: peaks in consecutive final years align within days
    final = i[-365:]
    prev = i[-730:-365]
    assert abs(int(final.argmax()) - int(prev.argmax())) <= 5
