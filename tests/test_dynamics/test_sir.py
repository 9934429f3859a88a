"""SIR dynamics vs closed-form theory (spec: reference tests/test_sir_dynamics/).

The final epidemic size of an SIR model solves the implicit equation
    log(s_inf / s_0) = R0 * (s_inf + r_inf_frac... )
more precisely, with s measured as a fraction and r(0)=0:
    s_inf = s_0 * exp(-R0 * (1 - s_inf))
These are backend-independent oracles for the ODE engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import root_scalar

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.sir import SIRParams, sir_ode


def _solve_sir(r0, infectious_period, s0, i0, days=500):
    p = SIRParams(
        beta=jnp.asarray(r0 / infectious_period),
        gamma=jnp.asarray(1.0 / infectious_period),
        contact_matrix=jnp.array([[1.0]]),
    )
    y0 = (jnp.array([s0]), jnp.array([i0]), jnp.array([0.0]))
    return simulate(sir_ode, days, y0, p, SolverParams(step_budget=512))


def _theoretical_final_size(r0, s0, i0):
    """Root of s_inf = s0 * exp(-R0 (1 - s_inf)) via bisection."""

    def f(s_inf):
        return s_inf - s0 * np.exp(-r0 * (1.0 - s_inf))

    return root_scalar(f, bracket=[1e-12, s0], method="bisect").root


@pytest.mark.parametrize("r0", [1.5, 2.0, 3.0])
def test_final_size_matches_theory(r0):
    s0, i0 = 0.999, 0.001
    sol = _solve_sir(r0, 7.0, s0, i0)
    s_end = float(sol.ys[0][-1, 0])
    expected = _theoretical_final_size(r0, s0, i0)
    assert abs(s_end - expected) < 2e-2


def test_mass_conservation():
    sol = _solve_sir(2.0, 7.0, 0.9, 0.1, days=300)
    total = sum(np.asarray(a).squeeze() for a in sol.ys)
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_subcritical_epidemic_dies_out():
    sol = _solve_sir(0.8, 7.0, 0.999, 0.001, days=500)
    i_end = float(sol.ys[1][-1, 0])
    assert i_end < 1e-6
    # most susceptibles untouched
    assert float(sol.ys[0][-1, 0]) > 0.99


def test_monotone_susceptibles():
    sol = _solve_sir(2.0, 7.0, 0.99, 0.01)
    s = np.asarray(sol.ys[0]).squeeze()
    assert np.all(np.diff(s) <= 1e-6)
