"""Adaptive (lockstep-dt) SEIP kernel: CPU fallback contract tests.

On CPU ``seip_ensemble_solve_adaptive`` routes to the pure-JAX lockstep
BS3(2) reference (one global block); these tests pin its accuracy against
a dense-grid RK4 oracle and the budget-exhaustion / save-selection /
packing contracts. Kernel-vs-fallback agreement on real TPU is gated in
bench_seip.py before any adaptive timing is reported (same pattern as the
constant-step kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config,
    seip_initial_state,
    seip_odeparams,
)
from dynode_tpu.ops.seip_pallas import (
    seip_ensemble_solve_adaptive,
    seip_solve_reference,
    unpack_members,
)


@pytest.fixture(scope="module")
def setup():
    cfg = seip_config(
        seasonal_vaccination=True,
        solver_params=SolverParams(constant_step_size=0.5),
    )
    p = seip_odeparams(cfg)
    y0 = seip_initial_state(cfg)
    scales = jnp.asarray([0.9, 1.0, 1.1], jnp.float32)
    return p, y0, scales


def test_adaptive_tracks_dense_oracle(setup):
    p, y0, scales = setup
    outs, stats = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=30, rtol=1e-5, atol=1e-5
    )
    assert int(np.asarray(stats["exhausted_intervals"]).sum()) == 0
    # the controller really adapts: more than one accepted step per save
    # interval on average, and at least one step size change happened
    assert int(np.asarray(stats["n_accepted"]).sum()) > 35
    ref = seip_solve_reference(y0, p, scales, duration=30, dt=0.01)
    for o, r in zip(outs, ref):
        o = np.asarray(o, np.float64)
        r = np.asarray(r, np.float64)
        assert np.isfinite(o).all()
        rel = np.max(np.abs(o - r)) / np.max(np.abs(r))
        assert rel < 1e-3, rel


def test_tolerance_scales_step_count(setup):
    p, y0, scales = setup
    _, loose = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=30, rtol=1e-3, atol=1e-2
    )
    _, tight = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=30, rtol=1e-6, atol=1e-6,
        steps_per_save=32,
    )
    assert int(np.asarray(tight["n_accepted"]).sum()) > 2 * int(
        np.asarray(loose["n_accepted"]).sum()
    )


def test_budget_exhaustion_is_loud_and_recovers(setup):
    p, y0, scales = setup
    outs, stats = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=10, rtol=1e-6, atol=1e-6, steps_per_save=1
    )
    bad = int(np.asarray(stats["exhausted_intervals"]).sum())
    assert bad > 0
    s = np.asarray(outs[0])
    nan_days = [
        t for t in range(s.shape[0]) if not np.isfinite(s[t]).all()
    ]
    # exhausted intervals emit NaN saves (loud), day 0 is always the
    # initial state, and the flag count matches the NaN days
    assert nan_days and 0 not in nan_days
    assert len(nan_days) == bad


def test_save_selection_packing_and_dtype(setup):
    p, y0, scales = setup
    full, _ = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=5, rtol=1e-4, atol=1e-3
    )
    c_only, _ = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=5, rtol=1e-4, atol=1e-3, save=(3,)
    )
    assert len(full) == 4 and len(c_only) == 1
    np.testing.assert_array_equal(np.asarray(c_only[0]), np.asarray(full[3]))

    bf, _ = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=5, rtol=1e-4, atol=1e-3, save=(3,),
        save_dtype=jnp.bfloat16,
    )
    assert bf[0].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf[0], np.float32),
        np.asarray(full[3], np.float32),
        rtol=1e-2,
        atol=1e-2,
    )

    # packed layout round-trips through unpack_members; member count must
    # be a multiple of 1024 for the (8, 128*nb) tile factorization
    sc = jnp.linspace(0.9, 1.1, 1024, dtype=jnp.float32)
    pk, _ = seip_ensemble_solve_adaptive(
        y0, p, sc, duration=3, rtol=1e-4, atol=1e-3, save=(3,), packed=True
    )
    up, _ = seip_ensemble_solve_adaptive(
        y0, p, sc, duration=3, rtol=1e-4, atol=1e-3, save=(3,)
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_members(pk[0])), np.asarray(up[0])
    )


def test_duration_must_be_save_multiple(setup):
    p, y0, scales = setup
    with pytest.raises(ValueError):
        seip_ensemble_solve_adaptive(
            y0, p, scales, duration=10.5, save_every=1.0
        )


def test_adaptive_kernel_interpret_matches_lockstep_reference(setup):
    """Execute the ACTUAL Pallas kernel (interpret mode) on CPU.

    The TPU equivalence gate lives in bench_seip; this is the only CI
    coverage of the kernel's control flow (startup DMAs, pl.when-guarded
    attempts, SMEM norm hand-off, pipelined save DMAs, flag tile). The
    kernel steps in f32 while the x64 reference decides dt in f64, so
    agreement is tolerance-scale, not bitwise.
    """
    import functools

    from jax.experimental import pallas as pl

    import dynode_tpu.ops.seip_pallas as sp

    p, y0, _ = setup
    P, dims, seasonal = sp._static_params(p)
    # per-strain rows differ (round 4: the kernel takes (L, B) scale banks
    # -- the posterior-predictive forecast shape) so this also covers the
    # per-strain lam path
    L = dims[-1]
    scales = jnp.stack(
        [
            jnp.linspace(0.9 + 0.02 * l, 1.1 - 0.02 * l, 1024)
            for l in range(L)
        ]
    ).astype(jnp.float32)
    y0p = tuple(
        sp.pack_members(
            jnp.broadcast_to(
                jnp.asarray(c, jnp.float32)[..., None], c.shape + (1024,)
            )
        )
        for c in y0
    )
    scp = sp.pack_members(scales)
    orig = pl.pallas_call
    sp.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        outs, flags = sp._solve_adaptive(
            y0p, scp, P=P, dims=dims, seasonal=seasonal,
            duration=3.0, save_every=1.0, rtol=1e-4, atol=1e-3, dt0=0.125,
            steps_per_save=8, save_mask=(False, False, False, True),
            save_dtype="float32",
        )
    finally:
        sp.pl.pallas_call = orig
    flags = np.asarray(flags)
    assert flags[0, 0, 0] == 0  # no exhausted intervals
    assert flags[0, 0, 1] >= 3  # at least one accepted step per interval
    c_kernel = np.asarray(sp.unpack_members(outs[0]), np.float64)
    ref, stats = sp.seip_solve_adaptive_reference(
        y0, p, scales, duration=3.0, rtol=1e-4, atol=1e-3, dt0=0.125
    )
    c_ref = np.asarray(ref[3], np.float64)
    rel = np.max(np.abs(c_kernel - c_ref)) / np.max(np.abs(c_ref))
    assert rel < 1e-3, rel
