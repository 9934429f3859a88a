"""Golden-trajectory regressions: lock solver numerics across refactors.

Golden files were generated on CPU float64 with the adaptive engine at the
reference tolerances (see tests/golden/). Any change that shifts solutions
beyond tolerance-level noise fails here before it reaches a benchmark.
"""

import os

import jax.numpy as jnp
import numpy as np

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_odeparams,
)
from dynode_tpu.models.seirs import seirs_config, seirs_ode, seirs_odeparams
from dynode_tpu.models.sir import SIRParams, sir_ode

GOLDEN = np.load(
    os.path.join(os.path.dirname(__file__), "..", "golden", "trajectories.npz")
)


def test_sir_matches_golden():
    p = SIRParams(
        beta=jnp.asarray(2.0 / 7),
        gamma=jnp.asarray(1 / 7.0),
        contact_matrix=jnp.array([[1.0]]),
    )
    y0 = (jnp.array([0.99]), jnp.array([0.01]), jnp.array([0.0]))
    sol = simulate(sir_ode, 150, y0, p, SolverParams(step_budget=512))
    np.testing.assert_allclose(
        np.asarray(sol.ys[1]).squeeze(), GOLDEN["sir_i"], rtol=1e-6, atol=1e-9
    )


def test_seirs_matches_golden():
    cfg = seirs_config(solver_params=SolverParams(step_budget=1024))
    sol = simulate(
        seirs_ode,
        500,
        cfg.initializer.get_initial_state(),
        seirs_odeparams(cfg),
        cfg.parameters.solver_params,
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys[2]).squeeze(), GOLDEN["seirs_i"], rtol=1e-5, atol=1e-6
    )


def test_multistrain_matches_golden():
    cfg = multistrain_config(solver_params=SolverParams(step_budget=512))
    sol = simulate(
        multistrain_ode,
        300,
        multistrain_initial_state(cfg),
        multistrain_odeparams(cfg),
        cfg.parameters.solver_params,
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys[4]), GOLDEN["multistrain_c"], rtol=1e-5, atol=1e-6
    )
