"""Engine-independent numerical oracle: scipy.integrate.solve_ivp.

The golden .npz regressions lock the engine against itself (refactor guard);
these tests break that circularity by integrating the same systems with
scipy RK45 at rtol=1e-10 — a solver stack sharing no code with the engine —
and asserting the adaptive engine at its production tolerances lands within
tolerance-level global error. A systematic engine bias (wrong tableau
coefficient, broken controller, dense-output bug) fails here even if the
goldens were regenerated around it. (Reference behavior contract:
/root/reference/src/dynode/simulation/odes.py:133-144 + its dynamics tests.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from scipy.integrate import solve_ivp

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


def scipy_trajectory(ode, y0_tuple, params, duration):
    """Integrate a dynode RHS with scipy RK45 at oracle tolerances."""
    flat0, unravel = ravel_pytree(y0_tuple)
    rhs_jit = jax.jit(
        lambda t, y: ravel_pytree(ode(t, unravel(y), params))[0]
    )

    def rhs(t, y):
        return np.asarray(rhs_jit(t, jnp.asarray(y)))

    ts = np.arange(0.0, duration + 1.0)
    sol = solve_ivp(
        rhs,
        (0.0, float(duration)),
        np.asarray(flat0),
        t_eval=ts,
        rtol=1e-10,
        atol=1e-12,
        method="RK45",
    )
    assert sol.success, sol.message
    return sol.y.T, unravel  # (T, D) flat states


def engine_flat(ode, y0_tuple, params, duration, solver_params):
    sol = simulate(ode, duration, y0_tuple, params, solver_params)
    assert int(sol.result) == 0
    T = sol.ys[0].shape[0]
    rows = [
        ravel_pytree(tuple(np.asarray(y[t]) for y in sol.ys))[0]
        for t in range(T)
    ]
    return np.stack(rows)


class TestScipyOracle:
    def test_sir_engine_matches_scipy(self):
        p = SIRParams(
            beta=jnp.asarray(2.0 / 7),
            gamma=jnp.asarray(1 / 7.0),
            contact_matrix=jnp.array([[1.0]]),
        )
        y0 = (jnp.array([0.99]), jnp.array([0.01]), jnp.array([0.0]))
        oracle, _ = scipy_trajectory(sir_ode, y0, p, 150)
        ours = engine_flat(sir_ode, y0, p, 150, SolverParams(step_budget=512))
        # engine runs at rtol=1e-5; global error vs the 1e-10 oracle stays
        # within tolerance accumulation. Absolute-dominant comparison: late
        # epidemic-decay compartments approach 0, where rel error is
        # meaningless (measured max abs err ~6e-6 on unit populations).
        np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=2e-5)

    def test_seirs_engine_matches_scipy(self):
        cfg = seirs_config(solver_params=SolverParams(step_budget=1024))
        y0 = cfg.initializer.get_initial_state()
        p = seirs_odeparams(cfg)
        oracle, _ = scipy_trajectory(seirs_ode, y0, p, 500)
        ours = engine_flat(seirs_ode, y0, p, 500, cfg.parameters.solver_params)
        scale = float(np.max(np.abs(oracle)))
        np.testing.assert_allclose(
            ours, oracle, rtol=5e-4, atol=5e-5 * scale
        )

    def test_multistrain_engine_matches_scipy(self):
        cfg = multistrain_config(solver_params=SolverParams(step_budget=512))
        y0 = multistrain_initial_state(cfg)
        p = multistrain_odeparams(cfg)
        oracle, _ = scipy_trajectory(multistrain_ode, y0, p, 300)
        ours = engine_flat(
            multistrain_ode, y0, p, 300, cfg.parameters.solver_params
        )
        scale = float(np.max(np.abs(oracle)))
        np.testing.assert_allclose(
            ours, oracle, rtol=5e-4, atol=5e-5 * scale
        )

    def test_goldens_match_scipy(self):
        """The stored golden arrays themselves agree with the independent
        oracle — the goldens are reference-quality, not engine-biased."""
        # SIR: golden stores the infected compartment over 150 days
        p = SIRParams(
            beta=jnp.asarray(2.0 / 7),
            gamma=jnp.asarray(1 / 7.0),
            contact_matrix=jnp.array([[1.0]]),
        )
        y0 = (jnp.array([0.99]), jnp.array([0.01]), jnp.array([0.0]))
        oracle, _ = scipy_trajectory(sir_ode, y0, p, 150)
        np.testing.assert_allclose(
            GOLDEN["sir_i"], oracle[:, 1], rtol=1e-3, atol=2e-5
        )
