"""simulate() contract tests (spec: reference tests/test_simulation/test_odes.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.simulation import (
    AbstractODEParams,
    build_saveat,
    simulate_ensemble,
    tune_step_budget,
)
from dynode_tpu.struct import pytree_dataclass


@pytree_dataclass
class _P(AbstractODEParams):
    beta: jnp.ndarray
    gamma: jnp.ndarray


def _ode(t, state, p: _P):
    s, i, r = state
    n = s + i + r
    flow = p.beta * s * i / n
    return (-flow, flow - p.gamma * i, p.gamma * i)


@pytest.fixture
def setup():
    p = _P(beta=jnp.asarray(0.3), gamma=jnp.asarray(0.1))
    y0 = (jnp.array([0.99]), jnp.array([0.01]), jnp.array([0.0]))
    sp = SolverParams(step_budget=256)
    return p, y0, sp


def test_output_shapes_int_duration(setup):
    p, y0, sp = setup
    sol = simulate(_ode, 100, y0, p, sp)
    assert all(a.shape == (101, 1) for a in sol.ys)
    assert sol.ts.shape == (101,)


def test_output_shapes_float_duration(setup):
    p, y0, sp = setup
    sol = simulate(_ode, 100.0, y0, p, sp)
    assert all(a.shape == (101, 1) for a in sol.ys)


def test_t0_state_preserved(setup):
    p, y0, sp = setup
    sol = simulate(_ode, 50, y0, p, sp)
    for saved, init in zip(sol.ys, y0):
        np.testing.assert_allclose(np.asarray(saved[0]), np.asarray(init))


def test_save_step_downsamples(setup):
    p, y0, sp = setup
    sol = simulate(_ode, 100, y0, p, sp, save_step=7)
    assert all(a.shape == (15, 1) for a in sol.ys)  # 100//7 + 1
    np.testing.assert_allclose(np.asarray(sol.ts[:2]), [0.0, 100.0 / 14])


def test_sub_save_indices(setup):
    p, y0, sp = setup
    sol = simulate(_ode, 20, y0, p, sp, sub_save_indices=(0, 2))
    assert sol.ys[0].shape == (21, 1)
    assert sol.ys[1].shape == (21, 0)
    assert sol.ys[2].shape == (21, 1)


def test_sub_save_with_save_step(setup):
    p, y0, sp = setup
    sol = simulate(_ode, 100, y0, p, sp, sub_save_indices=(1,), save_step=7)
    assert sol.ys[0].shape == (15, 0)
    assert sol.ys[1].shape == (15, 1)


def test_numpy_state_rejected(setup):
    p, _, sp = setup
    y0 = (np.array([0.9]), np.array([0.1]), np.array([0.0]))
    with pytest.raises(TypeError):
        simulate(_ode, 10, y0, p, sp)


def test_wrong_params_type_rejected(setup):
    _, y0, sp = setup

    @pytree_dataclass
    class Other(AbstractODEParams):
        beta: jnp.ndarray

    with pytest.raises(AssertionError):
        simulate(_ode, 10, y0, Other(beta=jnp.asarray(0.3)), sp)


def test_constant_step_size(setup):
    p, y0, _ = setup
    sp = SolverParams(constant_step_size=0.25)
    sol = simulate(_ode, 20, y0, p, sp)
    assert int(sol.result) == 0
    assert int(sol.stats["num_accepted"]) == 80


def test_adaptive_matches_constant_small_step(setup):
    p, y0, sp = setup
    adaptive = simulate(_ode, 100, y0, p, sp)
    fine = simulate(_ode, 100, y0, p, SolverParams(constant_step_size=0.05))
    for a, b in zip(adaptive.ys, fine.ys):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_budget_exhaustion_flags_and_nans(setup):
    p, y0, _ = setup
    sol = simulate(_ode, 100, y0, p, SolverParams(step_budget=4))
    assert int(sol.result) == 1
    assert bool(jnp.isnan(sol.ys[0][-1]).all())


def test_discontinuity_points_land_exactly(setup):
    """Growth-rate jump at t=30 with a known analytic solution: the clipped
    stepper must keep full adaptive accuracy right through (and AT) the jump."""
    p, _, _ = setup
    sp = SolverParams(step_budget=256, discontinuity_points=[30.0])

    def forced(t, state, q: _P):
        (x, a, b) = state
        rate = jnp.where(t >= 30.0, 0.9, 0.3)
        return (rate * x, jnp.zeros_like(a), jnp.zeros_like(b))

    y0 = (jnp.array([1.0]), jnp.array([0.0]), jnp.array([0.0]))
    sol = simulate(forced, 60, y0, p, sp)
    assert int(sol.result) == 0
    t = np.asarray(sol.ts)
    exact = np.where(
        t < 30, np.exp(0.3 * t), np.exp(0.3 * 30) * np.exp(0.9 * (t - 30))
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys[0]).squeeze(), exact, rtol=3e-4
    )


def test_build_saveat_grid():
    sa = build_saveat(0, 100, 7)
    assert sa.ts.shape == (15,)
    sa2 = build_saveat(0, 100, 0)  # step<=0 coerced to 1
    assert sa2.ts.shape == (101,)


def test_tune_step_budget(setup):
    p, y0, sp = setup
    tuned = tune_step_budget(_ode, 100, y0, p, sp)
    assert tuned.step_budget is not None
    assert tuned.step_budget % 64 == 0
    sol = simulate(_ode, 100, y0, p, tuned)
    assert int(sol.result) == 0


def test_simulate_ensemble(setup):
    import jax

    p, y0, sp = setup
    betas = jnp.linspace(0.2, 0.4, 8)
    batch = jax.vmap(lambda b: _P(beta=b, gamma=jnp.asarray(0.1)))(betas)
    sol = simulate_ensemble(_ode, 50, y0, batch, sp)
    assert sol.ys[0].shape == (8, 51, 1)
    assert sol.result.shape == (8,)
    finals = np.asarray(sol.ys[2][:, -1, 0])
    assert finals[-1] > finals[0]  # bigger beta -> bigger epidemic


def test_simulate_ensemble_sharded(setup):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from dynode_tpu.parallel import create_mesh

    p, y0, sp = setup
    mesh = create_mesh(("ensemble",))
    betas = jnp.linspace(0.2, 0.4, 16)
    batch = jax.vmap(lambda b: _P(beta=b, gamma=jnp.asarray(0.1)))(betas)
    sol = simulate_ensemble(_ode, 50, y0, batch, sp, mesh=mesh)
    assert sol.ys[0].shape == (16, 51, 1)
