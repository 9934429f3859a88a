"""Pallas ensemble-kernel correctness (interpret mode on CPU).

The real-TPU performance path is exercised by bench.py; here we verify the
kernel's arithmetic against (a) the identical lane-major lax.scan reference
and (b) the generic adaptive ODE engine.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import dynode_tpu.ops.multistrain_pallas as mp
from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_odeparams,
)


@pytest.fixture(scope="module")
def setup():
    cfg = multistrain_config(solver_params=SolverParams(step_budget=512))
    p = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    return cfg, p, y0


def test_pack_unpack_roundtrip(setup):
    _, _, y0 = setup
    packed = mp.pack_state(y0, 8)
    assert packed.shape == (mp.D_ROWS, 8)
    s, e, i, r, c = mp.unpack_saves(packed[None])
    np.testing.assert_allclose(np.asarray(s[0, 3]), np.asarray(y0[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(i[0, 5]), np.asarray(y0[2]), rtol=1e-6)


def test_lane_major_reference_matches_engine(setup):
    cfg, p, y0 = setup
    saves = mp.ensemble_solve_reference(
        y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
        batch=4, duration=100.0, dt=0.25,
    )
    s, e, i, r, c = mp.unpack_saves(saves)
    ref = simulate(multistrain_ode, 100, y0, p, cfg.parameters.solver_params)
    np.testing.assert_allclose(
        np.asarray(c[:, 0]),
        np.asarray(ref.ys[4]),
        rtol=5e-4,
        atol=1e-3,
    )


def test_per_member_parameters_differ(setup):
    _, p, y0 = setup
    B = 4
    scales = jnp.array([0.8, 1.0, 1.2, 1.4])
    beta = p.beta[None, :] * scales[:, None]
    saves = mp.ensemble_solve_reference(
        y0, beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
        batch=B, duration=100.0, dt=0.5,
    )
    _, _, _, _, c = mp.unpack_saves(saves)
    finals = np.asarray(c[-1].sum(axis=(1, 2)))
    assert finals[0] < finals[1] < finals[2] < finals[3]


def test_pallas_kernel_interpret_matches_reference(setup):
    _, p, y0 = setup
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        out = mp.ensemble_solve_tsit5(
            y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
            batch=128, duration=3.0, dt=1.0, block_b=128,
        )
        ref = mp.ensemble_solve_reference(
            y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
            batch=128, duration=3.0, dt=1.0,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5
        )
    finally:
        pl.pallas_call = orig


def test_generalized_dims_reference():
    """The lane-major solver generalizes beyond the 2x3 benchmark shape."""
    import jax

    from dynode_tpu.models.multistrain import (
        multistrain_config as cfg_fn,
        multistrain_initial_state as init_fn,
        multistrain_odeparams as params_fn,
    )

    cfg = cfg_fn(
        r0s=(2.0, 2.5), infectious_periods=(7.0, 6.0),
        latent_periods=(3.0, 2.5), waning_periods=(60.0, 80.0),
        strain_names=("A", "B"),
        age_names=("young", "mid", "old"),
        age_demographics=(0.4, 0.4, 0.2),
    )
    p = params_fn(cfg)
    y0 = init_fn(cfg)
    saves = mp.ensemble_solve_reference(
        y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
        batch=4, duration=50.0, dt=0.5, n_age=3, n_strain=2,
    )
    s, e, i, r, c = mp.unpack_saves(saves, n_age=3, n_strain=2)
    assert s.shape == (51, 4, 3) and c.shape == (51, 4, 3, 2)
    ref = simulate(multistrain_ode, 50, y0, p, cfg.parameters.solver_params)
    np.testing.assert_allclose(
        np.asarray(c[:, 0]), np.asarray(ref.ys[4]), rtol=5e-4, atol=1e-3
    )


def test_lane_major_xla_ensemble_matches_scalar():
    """The batch-last XLA RHS (no Pallas) equals the scalar RHS."""
    from dynode_tpu.models.multistrain import (
        multistrain_ensemble_params,
        multistrain_ensemble_state,
        multistrain_ode_ensemble,
    )

    cfg = multistrain_config(solver_params=SolverParams(constant_step_size=0.5))
    p = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    pb = multistrain_ensemble_params(p, jnp.array([1.0, 0.8, 1.2]))
    y0b = multistrain_ensemble_state(y0, 3)
    solb = simulate(
        multistrain_ode_ensemble, 100, y0b, pb, cfg.parameters.solver_params
    )
    sol1 = simulate(multistrain_ode, 100, y0, p, cfg.parameters.solver_params)
    for a, b in zip(solb.ys, sol1.ys):
        np.testing.assert_allclose(
            np.asarray(a[..., 0]), np.asarray(b), rtol=1e-9, atol=1e-9
        )


def test_2d_tile_kernel_matches_row_reference(setup):
    """The 2-D whole-tile kernel variant (kept as a measured negative
    result -- see the module comment) must still be the same arithmetic:
    2-D scan reference vs row reference, and interpret-mode Pallas vs the
    2-D reference."""
    _, p, y0 = setup
    saves2 = mp.ensemble_solve_tsit5_2d(
        y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
        batch=4, duration=50.0, dt=0.25,
    )
    got = mp.unpack_saves_2d(saves2)
    saves1 = mp.ensemble_solve_reference(
        y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
        batch=4, duration=50.0, dt=0.25,
    )
    want = mp.unpack_saves(saves1)
    for a, b in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4
        )

    import unittest.mock as um

    orig = pl.pallas_call
    mp.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        with um.patch.object(mp.jax, "default_backend", lambda: "tpu"):
            out = mp.ensemble_solve_tsit5_2d(
                y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
                batch=256, duration=10.0, dt=0.5, block_b=128,
            )
    finally:
        mp.pl.pallas_call = orig
    ref = mp.ensemble_solve_tsit5_2d(
        y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
        batch=256, duration=10.0, dt=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-4
    )


def test_pick_block_b_prefers_measured_sweet_spot():
    # 2048-lane blocks are the measured v5e optimum (block sweep probe);
    # fall down the divisor ladder when batch isn't 2048-aligned
    assert mp.pick_block_b(79872) == 2048   # 39 * 2048
    assert mp.pick_block_b(163840) == 2048
    assert mp.pick_block_b(1024) == 1024
    assert mp.pick_block_b(9984) == 256     # 39 * 256, not 512-aligned
    assert mp.pick_block_b(512) == 512
    # auto-pick (block_b=None) must produce a valid divisor in all cases
    for b in (256, 768, 9984, 79872):
        assert b % mp.pick_block_b(b) == 0


def test_auto_block_b_interpret_matches_reference(setup):
    """block_b=None routes through pick_block_b and stays member-exact."""
    import functools as ft
    import unittest.mock as um

    _, p, y0 = setup
    orig = pl.pallas_call
    mp.pl.pallas_call = ft.partial(orig, interpret=True)
    try:
        with um.patch.object(mp.jax, "default_backend", lambda: "tpu"):
            out = mp.ensemble_solve_tsit5(
                y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
                batch=512, duration=10.0, dt=0.5,  # auto block_b -> 512
            )
    finally:
        mp.pl.pallas_call = orig
    ref = mp.ensemble_solve_reference(
        y0, p.beta, p.sigma, p.gamma, p.omega, p.contact_matrix,
        batch=512, duration=10.0, dt=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-4
    )
