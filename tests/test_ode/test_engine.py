"""ODE-engine internals: convergence orders, controllers, dense output.

These validate the in-repo solver stack against analytic solutions --
the backend-independent ground truth the reference gets from diffrax.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynode_tpu.ode import (
    Bosh3,
    ConstantStepSize,
    Dopri5,
    Euler,
    Heun,
    ODETerm,
    PIDController,
    SaveAt,
    Tsit5,
    diffeqsolve,
)


def _linear(t, y, args):
    """y' = -y with y(0)=1 -> y(t) = exp(-t)."""
    return jax.tree_util.tree_map(lambda v: -v, y)


def _stiffish(t, y, args):
    """y' = cos(t) * y -> y(t) = exp(sin t)."""
    return jax.tree_util.tree_map(lambda v: jnp.cos(t) * v, y)


def _solve_const(solver, vf, dt, t1=2.0):
    y0 = (jnp.array([1.0]),)
    sol = diffeqsolve(
        ODETerm(vf),
        solver,
        0.0,
        t1,
        dt,
        y0,
        saveat=SaveAt(ts=jnp.array([t1])),
        stepsize_controller=ConstantStepSize(),
    )
    return float(sol.ys[0][-1, 0])


@pytest.mark.parametrize(
    "solver,order",
    [(Euler(), 1), (Heun(), 2), (Bosh3(), 3), (Tsit5(), 5), (Dopri5(), 5)],
)
def test_convergence_order(solver, order):
    """Halving dt must shrink the error by ~2^order."""
    exact = float(np.exp(np.sin(2.0)))
    errs = []
    for dt in (0.2, 0.1):
        errs.append(abs(_solve_const(solver, _stiffish, dt) - exact))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.6, f"observed rate {rate:.2f} for order-{order} solver"


def test_tsit5_high_accuracy_constant():
    got = _solve_const(Tsit5(), _linear, 0.05)
    assert abs(got - np.exp(-2.0)) < 1e-9


def test_adaptive_meets_tolerance():
    y0 = (jnp.array([1.0]),)
    for rtol, atol in [(1e-4, 1e-7), (1e-7, 1e-10)]:
        sol = diffeqsolve(
            ODETerm(_stiffish),
            Tsit5(),
            0.0,
            10.0,
            None,
            y0,
            saveat=SaveAt(ts=jnp.array([10.0])),
            stepsize_controller=PIDController(rtol=rtol, atol=atol),
            step_budget=512,
        )
        exact = np.exp(np.sin(10.0))
        err = abs(float(sol.ys[0][-1, 0]) - exact)
        assert err < 100 * rtol * exact + 1e-9


def test_tighter_tolerance_uses_more_steps():
    y0 = (jnp.array([1.0]),)

    def run(rtol):
        sol = diffeqsolve(
            ODETerm(_stiffish),
            Tsit5(),
            0.0,
            10.0,
            None,
            y0,
            saveat=SaveAt(ts=jnp.array([10.0])),
            stepsize_controller=PIDController(rtol=rtol, atol=rtol * 1e-2),
            step_budget=1024,
        )
        return int(sol.stats["num_accepted"])

    assert run(1e-8) > run(1e-3)


def test_dense_output_accuracy_between_steps():
    """Saved values on a fine grid must match the analytic curve even where
    the adaptive solver took big steps (exercises the Hermite post-pass)."""
    y0 = (jnp.array([1.0]),)
    grid = jnp.linspace(0.0, 5.0, 101)
    sol = diffeqsolve(
        ODETerm(_linear),
        Tsit5(),
        0.0,
        5.0,
        None,
        y0,
        saveat=SaveAt(ts=grid),
        stepsize_controller=PIDController(rtol=1e-6, atol=1e-9),
        step_budget=256,
    )
    expect = np.exp(-np.asarray(grid))
    np.testing.assert_allclose(
        np.asarray(sol.ys[0]).squeeze(), expect, rtol=1e-5
    )


def test_pytree_state_multiple_leaves():
    """Solver handles tuple states with mixed shapes/ranks."""

    def vf(t, y, args):
        a, b = y
        return (-a, -2.0 * b)

    y0 = (jnp.ones((2,)), jnp.ones((2, 3)))
    sol = diffeqsolve(
        ODETerm(vf),
        Tsit5(),
        0.0,
        1.0,
        None,
        y0,
        saveat=SaveAt(ts=jnp.array([0.0, 1.0])),
        stepsize_controller=PIDController(rtol=1e-8, atol=1e-10),
        step_budget=128,
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys[0][-1]), np.exp(-1.0), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys[1][-1]), np.exp(-2.0), rtol=1e-6
    )


def test_gradients_flow_through_adaptive_solve():
    """d/dk of y(t1) for y' = -k y must equal -t1 * exp(-k t1)."""

    def vf(t, y, args):
        return jax.tree_util.tree_map(lambda v: -args * v, y)

    def terminal(k):
        sol = diffeqsolve(
            ODETerm(vf),
            Tsit5(),
            0.0,
            2.0,
            None,
            (jnp.array([1.0]),),
            args=k,
            saveat=SaveAt(ts=jnp.array([2.0])),
            stepsize_controller=PIDController(rtol=1e-8, atol=1e-10),
            step_budget=256,
        )
        return sol.ys[0][-1, 0]

    g = float(jax.grad(terminal)(jnp.asarray(1.3)))
    expect = -2.0 * np.exp(-1.3 * 2.0)
    assert abs(g - expect) < 1e-5


def test_vmap_over_args():
    def vf(t, y, args):
        return jax.tree_util.tree_map(lambda v: -args * v, y)

    def final(k):
        sol = diffeqsolve(
            ODETerm(vf),
            Tsit5(),
            0.0,
            1.0,
            None,
            (jnp.array([1.0]),),
            args=k,
            saveat=SaveAt(ts=jnp.array([1.0])),
            stepsize_controller=PIDController(rtol=1e-8, atol=1e-10),
            step_budget=128,
        )
        return sol.ys[0][-1, 0]

    ks = jnp.array([0.5, 1.0, 2.0])
    outs = jax.vmap(final)(ks)
    np.testing.assert_allclose(np.asarray(outs), np.exp(-np.asarray(ks)), rtol=1e-6)
