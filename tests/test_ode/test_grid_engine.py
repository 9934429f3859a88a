"""Tests for the save-grid-bounded adaptive engine (round-3 redesign).

``diffeqsolve`` routes adaptive solves with uniform save grids to
``_solve_adaptive_grid``: bounded PID steps landing exactly on each save
point, direct emission, zero segment buffer (the ensemble-throughput path).
These tests pin the routing, the per-interval budget semantics, and the
equivalence with the buffered two-phase engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seirs import seirs_config, seirs_ode, seirs_odeparams
from dynode_tpu.models.sir import SIRParams, sir_ode
from dynode_tpu.ode import (
    ClipStepSizeController,
    PIDController,
    SaveAt,
    diffeqsolve,
)
from dynode_tpu.ode.integrate import _uniform_grid_info


def _sir_setup():
    p = SIRParams(
        beta=jnp.asarray(0.4),
        gamma=jnp.asarray(0.15),
        contact_matrix=jnp.array([[1.0]]),
    )
    y0 = (jnp.array([0.98]), jnp.array([0.02]), jnp.array([0.0]))
    return p, y0


class TestRouting:
    def test_uniform_grid_detected(self):
        assert _uniform_grid_info(jnp.linspace(0.0, 200.0, 201), 0, 200) == 200
        assert _uniform_grid_info(jnp.linspace(0.0, 10.0, 6), 0.0, 10.0) == 5

    def test_nonuniform_grid_rejected(self):
        ts = jnp.linspace(0.0, 200.0, 201).at[5].add(0.01)
        assert _uniform_grid_info(ts, 0, 200) is None

    def test_partial_span_rejected(self):
        # grid not spanning [t0, t1] must use the buffered engine
        assert _uniform_grid_info(jnp.linspace(0.0, 100.0, 101), 0, 200) is None

    def test_two_point_grid_uses_buffered_engine(self):
        # n_intervals < 3: grid path would put the whole budget in one
        # interval; the buffered engine handles it
        assert _uniform_grid_info(jnp.asarray([0.0, 200.0]), 0, 200) == 1
        p, y0 = _sir_setup()
        ctrl = ClipStepSizeController(PIDController(rtol=1e-5, atol=1e-6))
        sol = diffeqsolve(
            sir_ode, SolverParams().solver_method, 0.0, 100.0, None, y0,
            args=p, stepsize_controller=ctrl,
            saveat=SaveAt(ts=jnp.asarray([0.0, 100.0])),
        )
        assert int(sol.result) == 0
        # buffered engine reports its compiled budget, the grid engine k*(n-1)
        assert int(sol.stats["step_budget"]) >= 1024


class TestEquivalence:
    def test_matches_buffered_engine_within_tolerance(self):
        cfg = seirs_config(solver_params=SolverParams(step_budget=1024))
        sp = cfg.parameters.solver_params
        y0 = cfg.initializer.get_initial_state()
        params = seirs_odeparams(cfg)
        sol_grid = simulate(seirs_ode, 300, y0, params, sp)
        # force the buffered engine with a non-uniform grid on the same pts
        ts = jnp.linspace(0.0, 300.0, 301)
        ctrl = ClipStepSizeController(
            PIDController(
                rtol=sp.ode_solver_rel_tolerance,
                atol=sp.ode_solver_abs_tolerance,
            )
        )
        ts_nu = ts.at[1].add(1e-5)
        sol_buf = diffeqsolve(
            seirs_ode, sp.solver_method, 0.0, 300.0, None, tuple(y0),
            args=params, stepsize_controller=ctrl, saveat=SaveAt(ts=ts_nu),
            step_budget=1024,
        )
        assert int(sol_grid.result) == 0 and int(sol_buf.result) == 0
        for a, b in zip(sol_grid.ys, sol_buf.ys):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )

    def test_mass_conserved_exactly_on_grid(self):
        cfg = seirs_config()
        sp = cfg.parameters.solver_params
        y0 = cfg.initializer.get_initial_state()
        sol = simulate(seirs_ode, 200, y0, seirs_odeparams(cfg), sp)
        total = sum(np.asarray(c).sum(axis=1) for c in sol.ys)
        np.testing.assert_allclose(total, total[0], rtol=1e-9)

    def test_gradients_match_finite_differences(self):
        p, y0 = _sir_setup()
        sp = SolverParams()

        def loss(beta):
            sol = simulate(
                sir_ode, 60, y0, p.replace(beta=beta), sp
            )
            return jnp.sum(sol.ys[2][-1])

        g = float(jax.grad(loss)(jnp.asarray(0.4)))
        eps = 1e-6
        fd = float((loss(jnp.asarray(0.4 + eps)) - loss(jnp.asarray(0.4 - eps))) / (2 * eps))
        assert g == pytest.approx(fd, rel=1e-5)


class TestPerIntervalBudget:
    def test_exhaustion_flags_and_nanfills(self):
        # 1 step/interval can never resolve this solve at tight tolerance
        p, y0 = _sir_setup()
        sp = SolverParams(
            ode_solver_rel_tolerance=1e-10,
            ode_solver_abs_tolerance=1e-12,
            steps_per_save=2,
        )
        sol = simulate(sir_ode, 50, y0, p, sp)
        assert int(sol.result) != 0
        assert bool(jnp.any(jnp.isnan(sol.ys[1])))
        # t=0 save is always the exact initial state
        assert not bool(jnp.any(jnp.isnan(sol.ys[1][0])))

    def test_generous_budget_succeeds(self):
        p, y0 = _sir_setup()
        sp = SolverParams(steps_per_save=16)
        sol = simulate(sir_ode, 50, y0, p, sp)
        assert int(sol.result) == 0
        assert not bool(jnp.any(jnp.isnan(sol.ys[1])))
        # true compiled capacity (ADVICE r3): the first interval runs with
        # its own doubled bound (k_first = 2*16), the remaining 49 get 16
        assert int(sol.stats["step_budget"]) == 2 * 16 + 16 * 49

    def test_member_catches_up_after_exhausted_interval(self):
        # with a tiny per-interval budget the solve NaNs some early saves
        # but keeps integrating; whether it recovers, every non-NaN save
        # must still be accurate (compare against a generous-budget run)
        p, y0 = _sir_setup()
        sp_tight = SolverParams(steps_per_save=2)
        sp_ok = SolverParams(steps_per_save=16)
        a = simulate(sir_ode, 80, y0, p, sp_tight)
        b = simulate(sir_ode, 80, y0, p, sp_ok)
        av, bv = np.asarray(a.ys[1]), np.asarray(b.ys[1])
        good = ~np.isnan(av[:, 0])
        np.testing.assert_allclose(av[good], bv[good], rtol=1e-3, atol=1e-7)


class TestJumpTs:
    def test_discontinuity_inside_interval(self):
        # piecewise-constant decay rate switching mid-interval at t=10.35
        @jax.tree_util.register_static
        class _P:
            pass

        def rhs(t, y, params):
            k = jnp.where(t < 10.35, 0.1, 0.5)
            return (-k * y[0],)

        rhs.__annotations__ = {"params": _P}
        sp_j = SolverParams(discontinuity_points=[10.35])
        y0 = (jnp.array([1.0]),)
        sol = simulate(rhs, 30, y0, _P(), sp_j)
        assert int(sol.result) == 0
        t = np.arange(31.0)
        exact = np.where(
            t < 10.35,
            np.exp(-0.1 * t),
            np.exp(-0.1 * 10.35) * np.exp(-0.5 * (t - 10.35)),
        )
        # accumulated tolerance-level error: rtol 1e-5 per step composes
        # over ~30 days of integration
        np.testing.assert_allclose(
            np.asarray(sol.ys[0])[:, 0], exact, rtol=1e-4
        )


class TestEnsembleLaneMajorAdaptive:
    def test_shared_chain_matches_per_member_solutions(self):
        # lane-major adaptive (ONE shared dt chain) must agree with
        # per-member batch-leading solves to tolerance level
        from dynode_tpu.simulation import simulate_ensemble
        from dynode_tpu.models.seirs import seirs_config

        cfg = seirs_config()
        sp = cfg.parameters.solver_params
        y0 = cfg.initializer.get_initial_state()
        base = seirs_odeparams(cfg)
        scales = jnp.asarray([0.9, 1.0, 1.1, 1.2])
        batch = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (4,) + jnp.shape(leaf)), base
        )
        batch = batch.replace(beta=base.beta * scales)
        lane = simulate_ensemble(
            seirs_ode, 100, y0, batch, sp, layout="lane_major"
        )
        lead = simulate_ensemble(
            seirs_ode, 100, y0, batch, sp, layout="batch_leading"
        )
        assert int(lane.result) == 0
        for a, b in zip(lane.ys, lead.ys):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(a), -1, 0),
                np.asarray(b),
                rtol=5e-4,
                atol=1e-6,
            )
