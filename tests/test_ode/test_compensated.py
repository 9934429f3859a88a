"""Compensated (Kahan/double-word) f32 state accumulation.

The reference's default tolerances (rtol 1e-5 / atol 1e-6,
/root/reference/src/dynode/config/params.py:28-55) are unreachable in plain
f32 because accumulated roundoff grows with the step count;
``SolverParams.compensated_summation`` removes the O(n_steps) term. These
tests isolate the roundoff by integrating the same grid in f32 plain / f32
compensated / f64, so truncation error cancels and the accumulation error is
the whole difference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynode_tpu.config import SolverParams
from dynode_tpu.ode import SaveAt, Tsit5, diffeqsolve
from dynode_tpu.simulation import simulate


def _sir_rhs(dtype):
    beta = jnp.asarray(0.4, dtype)
    gamma = jnp.asarray(0.1, dtype)

    def rhs(t, y, args):
        s, i, r = y
        inf = beta * s * i
        return (-inf, inf - gamma * i, gamma * i)

    return rhs


def _solve(dtype, compensated, dt, duration=80.0):
    y0 = tuple(jnp.asarray(v, dtype) for v in (0.99, 0.01, 0.0))
    sol = diffeqsolve(
        _sir_rhs(dtype),
        Tsit5(),
        0.0,
        duration,
        dt,
        y0,
        saveat=SaveAt(ts=jnp.linspace(0.0, duration, 81)),
        compensated_summation=compensated,
    )
    return np.asarray(jnp.stack(sol.ys), dtype=np.float64)


class TestConstantStepAccumulation:
    def test_compensated_f32_beats_plain_f32(self):
        # 40k constant steps: plain f32 accumulates O(n * eps) roundoff;
        # compensation should recover >= 10x of it on the same step grid
        dt = 0.002
        ref = _solve(jnp.float64, False, dt)
        plain = _solve(jnp.float32, False, dt)
        comp = _solve(jnp.float32, True, dt)
        err_plain = np.max(np.abs(plain - ref))
        err_comp = np.max(np.abs(comp - ref))
        assert err_comp < err_plain / 10.0, (err_plain, err_comp)

    def test_f64_unchanged_by_compensation(self):
        dt = 0.05
        a = _solve(jnp.float64, False, dt)
        b = _solve(jnp.float64, True, dt)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-15)


class TestSolverParamsFlag:
    def _simulate(self, compensated, constant=True):
        sp = SolverParams(
            constant_step_size=0.01 if constant else 0.0,
            compensated_summation=compensated,
            ode_solver_rel_tolerance=1e-6,
            ode_solver_abs_tolerance=1e-8,
        )
        y0 = tuple(
            jnp.asarray(v, jnp.float64) for v in (9.9e3, 1.0e2, 0.0)
        )

        def rhs(t, y, args):
            s, i, r = y
            inf = 0.4 / 1e4 * s * i
            return (-inf, inf - 0.1 * i, 0.1 * i)

        return simulate(rhs, 50, y0, None, sp)

    def test_flag_reaches_constant_engine(self):
        a = self._simulate(False)
        b = self._simulate(True)
        for x, y in zip(a.ys, b.ys):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-10
            )

    def test_flag_reaches_adaptive_engine(self):
        a = self._simulate(False, constant=False)
        b = self._simulate(True, constant=False)
        assert int(a.result) == 0 and int(b.result) == 0
        for x, y in zip(a.ys, b.ys):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-8
            )

    def test_gradients_flow_through_compensated_path(self):
        sp = SolverParams(
            constant_step_size=0.05, compensated_summation=True
        )

        def loss(beta):
            def rhs(t, y, args):
                s, i, r = y
                inf = beta * s * i
                return (-inf, inf - 0.1 * i, 0.1 * i)

            y0 = tuple(
                jnp.asarray(v, jnp.float64) for v in (0.99, 0.01, 0.0)
            )
            sol = simulate(rhs, 30, y0, None, sp)
            return sol.ys[2][-1]

        g = jax.grad(loss)(jnp.asarray(0.4, jnp.float64))
        fd = (loss(0.4 + 1e-6) - loss(0.4 - 1e-6)) / 2e-6
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)
