"""Generic whole-solve-in-VMEM ensemble kernel: bring your own RHS.

The round-3/4 hand kernels (``multistrain_pallas``, ``seip_pallas``) proved
the layout that wins on TPU for wide ODE ensembles: **lane-major rows** --
each ensemble member occupies one vector lane for the entire solve, state
rows live in VMEM registers across all RK stages, and HBM is touched only
for the save grid. This module generalizes that design to ANY small-state
model: the user supplies the RHS in the measured-fast *rows idiom* and gets
the whole-solve kernel (1.2-1.9M traj/s class on the 26-row multistrain
workload at B>=80k, vs ~0.5M for XLA's best batch-leading layout) without
writing a line of Pallas.

The rows contract (the performance-critical part -- both hand kernels are
written this way):

    def rhs(y: list[Array], p: list[Array], t: Array) -> list[Array]

``y`` is a list of R state rows, each a ``(block,)`` f32 lane vector; ``p``
a list of P parameter rows; ``t`` a scalar. Structure dimensions (ages,
strains, compartments) are *Python loops over rows*; only the ensemble
axis is vectorized. This is exactly the multistrain kernel's ``_rhs_rows``
shape (multistrain_pallas.py) and is what Mosaic lowers to clean
full-width VPU ops -- whole-tile 2-D formulations measured *slower* (see
docs/ops.md "Measured kernel-vs-XLA reality" lesson 2). Two constraints
inherited from Mosaic:

- the RHS must not capture traced *arrays* from the closure (scalars are
  fine); per-member or shared array parameters go in ``p_rows``,
- no data-dependent Python control flow (it is traced once per stage).

Reference parity: this replaces the reference's diffrax ``diffeqsolve``
constant-step path for ensemble workloads
(/root/reference/src/dynode/simulation/odes.py:133); the adaptive default
lives in ``dynode_tpu.ode`` and ``seip_pallas``'s lockstep controller.

On non-TPU backends ``ensemble_solve_kernel`` transparently falls back to
``ensemble_solve_kernel_reference`` -- the identical math as one
``lax.scan`` -- which is also the interpret-mode equivalence oracle in
``tests/test_ops/test_generic_pallas.py``.

``ensemble_solve_kernel_adaptive`` is the adaptive (lockstep-dt) variant:
embedded BS3(2)/Tsit5(4) with the SEIP adaptive kernel's block-shared
I-controller, save-point clamping, per-interval attempt budgets, bf16
save staging, and pipelined save DMAs -- covering the reference's DEFAULT
(adaptive) solve mode for any rows-RHS model.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ode.solvers import Bosh3, Tsit5
from .multistrain_pallas import pick_block_b

__all__ = [
    "ensemble_solve_kernel",
    "ensemble_solve_kernel_adaptive",
    "ensemble_solve_kernel_adaptive_reference",
    "ensemble_solve_kernel_reference",
    "pack_rows",
    "unpack_rows",
]

# classic RK4 (the SEIP kernel's scheme: diagonal tableau, 4 live groups)
_RK4_A = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = (1 / 6, 1 / 3, 1 / 3, 1 / 6)
_RK4_C = (0.0, 0.5, 0.5, 1.0)

#: method -> (a, b, c, n_stages); FSAL schemes are truncated to the stages
#: that contribute to the constant-step update (Tsit5's 7th / Bosh3's 4th
#: stage has b == 0 and only feeds the embedded error estimate)
_METHODS = {
    "tsit5": (Tsit5.a, Tsit5.b, tuple(float(x) for x in Tsit5.c), 6),
    "bosh3": (Bosh3.a, Bosh3.b, tuple(float(x) for x in Bosh3.c), 3),
    "rk4": (_RK4_A, _RK4_B, _RK4_C, 4),
}

#: adaptive method -> (a, b, e, c, n_stages, err_order); both are FSAL
#: pairs (last stage = f(t+dt, y_new), b[last] == 0, feeds only the
#: embedded error). bosh3 is the default: 4 RHS evals per attempt -- the
#: same trade the SEIP adaptive kernel measured best (ops/seip_pallas.py).
_ADAPTIVE_METHODS = {
    "tsit5": (Tsit5.a, Tsit5.b, Tsit5.e,
              tuple(float(x) for x in Tsit5.c), 7, float(Tsit5.err_order)),
    "bosh3": (Bosh3.a, Bosh3.b, Bosh3.e,
              tuple(float(x) for x in Bosh3.c), 4, float(Bosh3.err_order)),
}


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


# ---------------------------------------------------------------------------
# pytree <-> rows packing helpers
# ---------------------------------------------------------------------------


def pack_rows(leaves: Sequence[jnp.ndarray], batch: int):
    """Lane-major leaves ``(*struct, B)`` -> packed ``(R, B)`` + spec.

    Leaves with no batch axis (shared across members) are broadcast.
    Returns ``(packed, spec)`` where ``spec`` is the per-leaf struct-shape
    list consumed by :func:`unpack_rows`.
    """
    rows, spec = [], []
    for leaf in leaves:
        leaf = jnp.asarray(leaf, jnp.float32)
        if leaf.ndim == 0 or leaf.shape[-1] != batch:
            leaf = jnp.broadcast_to(leaf[..., None], (*leaf.shape, batch))
        struct = leaf.shape[:-1]
        spec.append(struct)
        rows.append(leaf.reshape(-1, batch))
    return jnp.concatenate(rows, axis=0), tuple(spec)


def unpack_rows(packed: jnp.ndarray, spec) -> list[jnp.ndarray]:
    """Inverse of :func:`pack_rows`; accepts ``(R, B)`` or ``(T, R, B)``."""
    out, off = [], 0
    lead = packed.shape[:-2]
    batch = packed.shape[-1]
    for struct in spec:
        size = int(np.prod(struct, dtype=int)) if struct else 1
        blk = packed[..., off : off + size, :]
        out.append(blk.reshape(*lead, *struct, batch))
        off += size
    return out


# ---------------------------------------------------------------------------
# one RK step on rows (shared by kernel and reference -- single math source)
# ---------------------------------------------------------------------------


def _rk_step_rows(rhs, y, p, t, dt, a, b, c, n_stages):
    n_rows = len(y)
    ks = []
    for stage in range(n_stages):
        if stage == 0:
            y_stage = y
        else:
            coeffs = a[stage - 1]
            y_stage = [
                y[r]
                + dt
                * sum(
                    coeffs[j] * ks[j][r]
                    for j in range(stage)
                    if coeffs[j] != 0.0
                )
                for r in range(n_rows)
            ]
        ks.append(rhs(y_stage, p, t + c[stage] * dt))
    return [
        y[r] + dt * sum(b[j] * ks[j][r] for j in range(n_stages) if b[j] != 0.0)
        for r in range(n_rows)
    ]


def _rk_embedded_step_rows(rhs, y, p, t, dt, a, b, e, c, n_stages, f0=None):
    """One embedded FSAL RK attempt on rows: (y_new, err_rows, k_last).

    The last stage is evaluated at ``y_new`` (FSAL structure shared by both
    adaptive tableaus; ``b[last] == 0``) so the advanced solution costs
    ``n_stages - 1`` stage-input constructions.

    ``f0``: optional precomputed first stage ``f(t, y)`` -- the First Same
    As Last property: after an ACCEPT the returned ``k_last`` (evaluated
    at ``y_new``) IS the next attempt's first stage, and after a REJECT
    ``(t, y)`` are unchanged so the old first stage is still exact.
    Reusing it cuts the steady-state cost from 4 to 3 RHS evals per BS3
    attempt (callers maintain the f0 carry).
    """
    n_rows = len(y)
    n_sub = n_stages - 1
    ks = []
    for stage in range(n_sub):
        if stage == 0:
            if f0 is not None:
                ks.append(list(f0))
                continue
            y_stage = y
        else:
            coeffs = a[stage - 1]
            y_stage = [
                y[r]
                + dt
                * sum(
                    coeffs[j] * ks[j][r]
                    for j in range(stage)
                    if coeffs[j] != 0.0
                )
                for r in range(n_rows)
            ]
        ks.append(rhs(y_stage, p, t + c[stage] * dt))
    y_new = [
        y[r] + dt * sum(b[j] * ks[j][r] for j in range(n_sub) if b[j] != 0.0)
        for r in range(n_rows)
    ]
    k_last = list(rhs(y_new, p, t + c[n_stages - 1] * dt))
    ks.append(k_last)
    err = [
        dt * sum(e[j] * ks[j][r] for j in range(n_stages) if e[j] != 0.0)
        for r in range(n_rows)
    ]
    return y_new, err, k_last


def _check_save_rows(save_rows, n_rows):
    """Normalize/validate a ``save_rows`` selection to a static tuple."""
    if save_rows is None:
        return tuple(range(n_rows))
    rows = tuple(int(r) for r in save_rows)
    if not rows:
        raise ValueError("save_rows must select at least one row")
    for r in rows:
        if not 0 <= r < n_rows:
            raise ValueError(
                f"save_rows index {r} out of range for {n_rows} state rows"
            )
    return rows


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _solve_kernel(
    y_ref,
    p_ref,
    out_ref,
    scratch,
    sem,
    *,
    rhs,
    n_rows: int,
    n_params: int,
    dt: float,
    t0: float,
    n_steps: int,
    save_stride: int,
    tableau,
    save_rows,
):
    a, b, c, n_stages = tableau
    s_pad = scratch.shape[0]
    i = pl.program_id(0)
    block_b = scratch.shape[1]
    p = [p_ref[r, :] for r in range(n_params)]

    def _dma(slot):
        return pltpu.make_async_copy(
            scratch,
            out_ref.at[slot, :, pl.ds(i * block_b, block_b)],
            sem,
        )

    def save(slot, rows):
        # pipelined: stage (casting to the save dtype when narrow), start
        # the DMA, defer the wait until just before the staging tile is
        # next overwritten -- a full save_stride of RK steps later
        for j, r in enumerate(save_rows):
            scratch[j, :] = rows[r].astype(scratch.dtype)
        _dma(slot).start()

    for j in range(len(save_rows), s_pad):  # zero padding rows once
        scratch[j, :] = jnp.zeros_like(scratch[j, :])
    y = [y_ref[r, :] for r in range(n_rows)]
    save(0, y)

    # rolled time loop (unrolling n_steps explodes compile time); stages
    # unrolled inside; predicated save on the stride
    def body(step, rows):
        t = t0 + (step - 1).astype(jnp.float32) * dt
        rows = _rk_step_rows(rhs, list(rows), p, t, dt, a, b, c, n_stages)

        @pl.when(step % save_stride == 0)
        def _():
            slot = step // save_stride
            _dma(slot - 1).wait()
            save(slot, rows)

        return tuple(rows)

    jax.lax.fori_loop(1, n_steps + 1, body, tuple(y))
    _dma(n_steps // save_stride).wait()


def ensemble_solve_kernel(
    rhs: Callable,
    y0_rows: jnp.ndarray,
    p_rows: jnp.ndarray | None = None,
    *,
    duration: float,
    dt: float,
    save_every: float = 1.0,
    block_b: int | None = None,
    method: str = "tsit5",
    t0: float = 0.0,
    save_dtype=jnp.float32,
    save_rows: Sequence[int] | None = None,
    padded_rows: bool = False,
):
    """Whole-solve lane-major ensemble kernel for a user rows-RHS.

    Parameters
    ----------
    rhs: ``rhs(y_rows, p_rows, t) -> dy_rows`` in the rows idiom (module
        docstring). Traced once per RK stage into the kernel.
    y0_rows: ``(R, B)`` f32 initial state (use :func:`pack_rows`).
    p_rows: ``(P, B)`` f32 parameter rows, or None.
    duration, dt, save_every: uniform save grid; ``duration/dt`` and
        ``save_every/dt`` must be whole.
    block_b: lane-block width; None auto-picks (2048 sweet spot).
    method: ``"tsit5"`` (default, matches SolverParams), ``"bosh3"``,
        ``"rk4"``.
    save_dtype: dtype of the save buffer; ``jnp.bfloat16`` halves the
        (n_saves, R, B) HBM footprint AND the save-DMA volume (downcast
        happens in the VMEM staging tile before the DMA -- the lever that
        unlocked full-width SEIP saves, ops/seip_pallas.py).
    save_rows: row indices to save (any order; default all R rows). The
        output buffer is the kernel's max-width bound, so saving only the
        observable rows (e.g. the cumulative-incidence rows of a fit)
        multiplies the widest ensemble that fits in HBM -- the generic
        analog of the SEIP kernel's ``save=`` (ops/seip_pallas.py).
    padded_rows: return the raw 8-sublane-padded save buffer
        ``(n_saves, pad8(len(save_rows)), B)`` (padding rows zero)
        instead of slicing to exact rows. Mosaic save DMAs require
        8-aligned row tiles, so the exact-rows result is a full-size
        post-kernel COPY: at max ensemble width the padded buffer and
        the sliced copy coexist (~1.7x the peak HBM of the buffer
        alone). ``padded_rows=True`` skips the copy -- the max-width
        lever when the save buffer bounds the ensemble.

    Returns ``(n_saves, len(save_rows), B)`` saves in ``save_dtype``
    (rows in ``save_rows`` order; :func:`unpack_rows` for the full-rows
    case). Solve math is always f32; only saves narrow.
    """
    if method not in _METHODS:
        raise ValueError(f"unknown method {method!r}; one of {list(_METHODS)}")
    y0_rows = jnp.asarray(y0_rows, jnp.float32)
    if y0_rows.ndim != 2:
        raise ValueError(f"y0_rows must be (R, B), got {y0_rows.shape}")
    n_rows, batch = y0_rows.shape
    if p_rows is None:
        p_rows = jnp.zeros((0, batch), jnp.float32)
    p_rows = jnp.asarray(p_rows, jnp.float32)
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    if abs(n_steps * dt - duration) > 1e-9 * max(1.0, abs(duration)):
        raise ValueError("duration must be a whole number of dt steps")
    if n_steps % save_stride:
        raise ValueError("save_every must divide duration into whole strides")
    save_rows = _check_save_rows(save_rows, n_rows)

    if jax.default_backend() not in ("tpu",):
        full = ensemble_solve_kernel_reference(
            rhs, y0_rows, p_rows, duration=duration, dt=dt,
            save_every=save_every, method=method, t0=t0,
        ).astype(save_dtype)
        picked = full[:, list(save_rows), :]
        if padded_rows:
            return _pad_save_rows(picked)
        return picked
    if block_b is None:
        block_b = pick_block_b(batch)
    if batch % block_b:
        raise ValueError(f"batch {batch} must divide into {block_b}-lane blocks")
    return _solve_pallas(
        y0_rows, p_rows, rhs=rhs, duration=float(duration), dt=float(dt),
        save_every=float(save_every), block_b=int(block_b), method=method,
        t0=float(t0), save_dtype=jnp.dtype(save_dtype).name,
        save_rows=save_rows, padded_rows=bool(padded_rows),
    )


def _pad_save_rows(picked):
    """Replicate the kernel's 8-padded save layout (zero padding rows)."""
    n_saves, n_save, batch = picked.shape
    s_pad = _pad8(n_save)
    if s_pad == n_save:
        return picked
    pad = jnp.zeros((n_saves, s_pad - n_save, batch), picked.dtype)
    return jnp.concatenate([picked, pad], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("rhs", "duration", "dt", "save_every", "block_b",
                     "method", "t0", "save_dtype", "save_rows",
                     "padded_rows"),
)
def _solve_pallas(
    y0_rows, p_rows, *, rhs, duration, dt, save_every, block_b, method, t0,
    save_dtype="float32", save_rows=None, padded_rows=False,
):
    n_rows, batch = y0_rows.shape
    n_params = p_rows.shape[0]
    if save_rows is None:
        save_rows = tuple(range(n_rows))
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    n_saves = n_steps // save_stride + 1
    d_pad = _pad8(n_rows)
    s_pad = _pad8(len(save_rows))
    p_pad = _pad8(max(n_params, 1))
    save_dtype = jnp.dtype(save_dtype)

    y_padded = jnp.zeros((d_pad, batch), jnp.float32).at[:n_rows].set(y0_rows)
    p_padded = jnp.zeros((p_pad, batch), jnp.float32).at[:n_params].set(p_rows)

    kernel = functools.partial(
        _solve_kernel,
        rhs=rhs,
        n_rows=n_rows,
        n_params=n_params,
        dt=dt,
        t0=t0,
        n_steps=n_steps,
        save_stride=save_stride,
        tableau=_METHODS[method],
        save_rows=save_rows,
    )
    grid = (batch // block_b,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_saves, s_pad, batch), save_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((s_pad, block_b), save_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(y_padded, p_padded)
    if padded_rows:
        return out
    return out[:, : len(save_rows), :]


# ---------------------------------------------------------------------------
# lax.scan reference (identical math; CPU fallback + interpret oracle)
# ---------------------------------------------------------------------------


def ensemble_solve_kernel_reference(
    rhs, y0_rows, p_rows=None, *, duration, dt, save_every=1.0,
    method="tsit5", t0=0.0,
):
    """The kernel's computation as one ``lax.scan`` over save strides."""
    a, b, c, n_stages = _METHODS[method]
    y0_rows = jnp.asarray(y0_rows, jnp.float32)
    n_rows, batch = y0_rows.shape
    if p_rows is None:
        p_rows = jnp.zeros((0, batch), jnp.float32)
    p_rows = jnp.asarray(p_rows, jnp.float32)  # kernel parity: f32 math
    p = [p_rows[r] for r in range(p_rows.shape[0])]
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    n_outer = n_steps // save_stride

    def inner(carry, step):
        rows, t = carry
        rows = _rk_step_rows(rhs, list(rows), p, t, dt, a, b, c, n_stages)
        return (tuple(rows), t + dt), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(inner, carry, jnp.arange(save_stride))
        return carry, jnp.stack(carry[0], axis=0)

    y = tuple(y0_rows[r] for r in range(n_rows))
    _, saves = jax.lax.scan(
        outer, (y, jnp.float32(t0)), None, length=n_outer
    )
    return jnp.concatenate([jnp.stack(y, axis=0)[None], saves], axis=0)


# ---------------------------------------------------------------------------
# adaptive (lockstep-dt) variant
# ---------------------------------------------------------------------------
#
# The generic analog of the SEIP adaptive kernel (ops/seip_pallas.py
# ``_seip_kernel_adaptive``): dt is LOCKSTEP PER LANE BLOCK -- each Pallas
# program carries one scalar (t, dt) chain, the controller norm is the max
# over the block of each member's scaled RMS error (so every member
# satisfies the tolerance and the block's dt is set by its currently
# stiffest member), and dt is clamped to land EXACTLY on each save point
# with the grid engine's semantics (ode/integrate.py): an ACCEPTED clamped
# step keeps the natural dt, a REJECTED one shrinks from the clamped size.
# Budget exhaustion (more than steps_per_save attempts in one save
# interval; the FIRST interval gets max(4x, 32) for the dt0 ramp + initial
# transient) emits NaN saves until the block catches up and is counted in
# the returned stats -- the SolverParams.step_budget contract.
#
# Layout difference from the SEIP kernel: rows-idiom state is small enough
# that RK stages live as *registers* -- only the live state y and the
# accepted-candidate accumulator need VMEM scratch refs (values cannot
# escape a pl.when region; the scalar controller norm escapes through
# SMEM, the candidate through its ref). Saves are pipelined bf16-capable
# DMAs exactly as in the constant-step kernel above.


def _solve_kernel_adaptive(
    y_ref,
    p_ref,
    out_ref,
    flag_ref,
    y_scr,
    ac_scr,
    f_scr,
    stage,
    sem,
    nrm_ref,
    *,
    rhs,
    n_rows: int,
    n_params: int,
    n_saves: int,
    save_every: float,
    steps_per_save: int,
    rtol: float,
    atol: float,
    dt0: float,
    t0: float,
    tableau,
    save_rows,
):
    a, b, e, c, n_stages, err_order = tableau
    i = pl.program_id(0)
    s_pad, block_b = stage.shape
    f32 = jnp.float32
    i32 = jnp.int32
    eps = 1e-6 * max(float(save_every), 1.0)
    p = [p_ref[r, :] for r in range(n_params)]

    for r in range(n_rows):
        y_scr[r, :] = y_ref[r, :]
    # seed the FSAL carry: one up-front f(t0, y0) eval, reused by every
    # first stage thereafter (refreshed with k_last on each ACCEPT; exact
    # after a REJECT since (t, y) are unchanged)
    f_init = rhs([y_ref[r, :] for r in range(n_rows)], p, jnp.float32(t0))
    for r in range(n_rows):
        f_scr[r, :] = f_init[r]
    for j in range(len(save_rows), s_pad):  # zero padding rows once
        stage[j, :] = jnp.zeros_like(stage[j, :])

    def _dma(slot):
        return pltpu.make_async_copy(
            stage,
            out_ref.at[slot, :, pl.ds(i * block_b, block_b)],
            sem,
        )

    def save(slot, reached):
        for j, r in enumerate(save_rows):
            v = y_scr[r, :]
            stage[j, :] = jnp.where(
                reached, v, jnp.full_like(v, jnp.nan)
            ).astype(stage.dtype)
        _dma(slot).start()

    save(0, jnp.asarray(True))

    def make_attempt(s_end):
        def attempt(_, carry):
            t, dt_next, na, nr = carry
            remaining = s_end - t
            active = remaining > eps
            dt_used = jnp.minimum(dt_next, remaining)
            landing = dt_used >= remaining - eps

            @pl.when(active)
            def _():
                rows = [y_scr[r, :] for r in range(n_rows)]
                y_new, err, k_last = _rk_embedded_step_rows(
                    rhs, rows, p, t, dt_used, a, b, e, c, n_stages,
                    f0=[f_scr[r, :] for r in range(n_rows)],
                )
                sq = None
                for r in range(n_rows):
                    sc = atol + rtol * jnp.maximum(
                        jnp.abs(rows[r]), jnp.abs(y_new[r])
                    )
                    q = err[r] / sc
                    sq = q * q if sq is None else sq + q * q
                norm_in = jnp.max(jnp.sqrt(sq * (1.0 / n_rows)))
                nrm_ref[0] = norm_in
                # same accept predicate the outer code derives from SMEM;
                # on ACCEPT the FSAL carry becomes k_last (f at y_new)
                good_in = jnp.isfinite(norm_in) & (norm_in <= 1.0)
                for r in range(n_rows):
                    ac_scr[r, :] = y_new[r]
                    f_scr[r, :] = jnp.where(good_in, k_last[r], f_scr[r, :])

            norm = nrm_ref[0]  # stale when inactive: every update is masked
            ok = jnp.isfinite(norm)
            safe = jnp.maximum(norm, jnp.asarray(1e-30, f32))
            # norm**(-1/err_order) via exp/log: Mosaic has no scalar powf
            factor = jnp.clip(
                0.9 * jnp.exp(jnp.log(safe) * (-1.0 / err_order)), 0.2, 10.0
            )
            factor = jnp.where(ok, factor, jnp.asarray(0.2, f32))
            good = ok & (norm <= 1.0)
            acc = active & good
            # an ACCEPTED save-clamped step says nothing about the natural
            # dt (it was artificially short): keep dt_next; a REJECTED one
            # must shrink from the clamped size (grid-engine semantics)
            dt_new = jnp.where(landing & good, dt_next, dt_used * factor)
            dt_new = jnp.where(active, dt_new, dt_next)

            @pl.when(acc)
            def _():
                for r in range(n_rows):
                    y_scr[r, :] = ac_scr[r, :]

            t_new = jnp.where(acc, jnp.where(landing, s_end, t + dt_used), t)
            na = na + acc.astype(i32)
            nr = nr + (active & ~acc).astype(i32)
            return (t_new, dt_new, na, nr)

        return attempt

    def run_interval(carry, s_end, k_attempts):
        t, dt, na, nr, bad = carry
        t, dt, na, nr = jax.lax.fori_loop(
            0, k_attempts, make_attempt(s_end), (t, dt, na, nr)
        )
        reached = t >= s_end - eps
        bad = bad + (~reached).astype(i32)
        return (t, dt, na, nr, bad), reached

    carry = (
        jnp.asarray(t0, f32),
        jnp.asarray(dt0, f32),
        jnp.zeros((), i32),
        jnp.zeros((), i32),
        jnp.zeros((), i32),
    )
    k_first = max(4 * steps_per_save, 32)
    carry, reached1 = run_interval(
        carry, jnp.asarray(t0 + save_every, f32), k_first
    )
    _dma(0).wait()
    save(1, reached1)

    def outer(s, carry):
        s_end = t0 + s.astype(f32) * save_every
        carry, reached = run_interval(carry, s_end, steps_per_save)
        _dma(s - 1).wait()
        save(s, reached)
        return carry

    carry = jax.lax.fori_loop(2, n_saves, outer, carry)
    _dma(n_saves - 1).wait()

    _, _, na, nr, bad = carry
    col = jax.lax.broadcasted_iota(i32, (8, 128), 1)
    flag_ref[0] = jnp.where(
        col == 0, bad, jnp.where(col == 1, na, jnp.where(col == 2, nr, 0))
    )


@functools.partial(
    jax.jit,
    static_argnames=("rhs", "duration", "save_every", "steps_per_save",
                     "rtol", "atol", "dt0", "block_b", "method", "t0",
                     "save_dtype", "save_rows", "padded_rows"),
)
def _solve_pallas_adaptive(
    y0_rows, p_rows, *, rhs, duration, save_every, steps_per_save, rtol,
    atol, dt0, block_b, method, t0, save_dtype="float32", save_rows=None,
    padded_rows=False,
):
    n_rows, batch = y0_rows.shape
    n_params = p_rows.shape[0]
    if save_rows is None:
        save_rows = tuple(range(n_rows))
    n_saves = int(round(duration / save_every)) + 1
    d_pad = _pad8(n_rows)
    s_pad = _pad8(len(save_rows))
    p_pad = _pad8(max(n_params, 1))
    save_dtype = jnp.dtype(save_dtype)

    y_padded = jnp.zeros((d_pad, batch), jnp.float32).at[:n_rows].set(y0_rows)
    p_padded = jnp.zeros((p_pad, batch), jnp.float32).at[:n_params].set(p_rows)

    kernel = functools.partial(
        _solve_kernel_adaptive,
        rhs=rhs,
        n_rows=n_rows,
        n_params=n_params,
        n_saves=n_saves,
        save_every=save_every,
        steps_per_save=steps_per_save,
        rtol=rtol,
        atol=atol,
        dt0=dt0,
        t0=t0,
        tableau=_ADAPTIVE_METHODS[method],
        save_rows=save_rows,
    )
    nb = batch // block_b
    out, flags = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_saves, s_pad, batch), save_dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32),
        ],
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((d_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((d_pad, block_b), jnp.float32),
            pltpu.VMEM((d_pad, block_b), jnp.float32),
            # FSAL carry: f(t, y) of the live state (round 5: reusing it
            # cuts BS3 from 4 to 3 RHS evals per steady-state attempt)
            pltpu.VMEM((d_pad, block_b), jnp.float32),
            pltpu.VMEM((s_pad, block_b), save_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.float32),
        ],
    )(y_padded, p_padded)
    if padded_rows:
        return out, flags
    return out[:, : len(save_rows), :], flags


def ensemble_solve_kernel_adaptive(
    rhs: Callable,
    y0_rows: jnp.ndarray,
    p_rows: jnp.ndarray | None = None,
    *,
    duration: float,
    save_every: float = 1.0,
    rtol: float = 1e-4,
    atol: float = 1e-6,
    dt0: float | None = None,
    steps_per_save: int = 8,
    block_b: int | None = None,
    method: str = "bosh3",
    save_dtype=jnp.float32,
    t0: float = 0.0,
    save_rows: Sequence[int] | None = None,
    padded_rows: bool = False,
):
    """Adaptive (lockstep-dt) whole-solve ensemble kernel for a rows-RHS.

    The adaptive analog of :func:`ensemble_solve_kernel` -- the reference's
    DEFAULT solve mode is adaptive
    (/root/reference/src/dynode/config/params.py:36-47). Embedded
    Bogacki-Shampine 3(2) (default; 4 RHS evals/attempt) or Tsitouras 5(4)
    with an I-controller; dt shared across each lane block and driven by
    the block's max per-member scaled RMS error; clamped to land exactly on
    each save point (see the kernel comment above
    :func:`_solve_kernel_adaptive` for the full contract).

    ``atol`` defaults to 1e-6 -- scaled for O(1) states (proportions). For
    ~1e3-scale populations use atol=1e-3: f64-calibrated defaults make the
    f32 controller thrash (CLAUDE.md).

    Returns ``(saves, stats)``: saves ``(n_saves, len(save_rows), B)`` in
    ``save_dtype`` (all state rows when ``save_rows`` is None; NaN rows
    where a block's attempt budget ran out); ``stats`` has per-block int32
    arrays ``exhausted_intervals`` (nonzero means raise
    ``steps_per_save``), ``n_accepted``, ``n_rejected``. Off-TPU falls back
    to :func:`ensemble_solve_kernel_adaptive_reference` (one global
    lockstep block). ``save_rows`` selects which rows are saved -- the
    output buffer bounds the kernel's max width, so observable-only saves
    widen the largest ensemble that fits; ``padded_rows=True``
    additionally skips the exact-rows slice copy (see
    :func:`ensemble_solve_kernel`).
    """
    if method not in _ADAPTIVE_METHODS:
        raise ValueError(
            f"unknown method {method!r}; one of {list(_ADAPTIVE_METHODS)}"
        )
    y0_rows = jnp.asarray(y0_rows, jnp.float32)
    if y0_rows.ndim != 2:
        raise ValueError(f"y0_rows must be (R, B), got {y0_rows.shape}")
    n_rows, batch = y0_rows.shape
    if p_rows is None:
        p_rows = jnp.zeros((0, batch), jnp.float32)
    p_rows = jnp.asarray(p_rows, jnp.float32)
    n_saves = int(round(duration / save_every)) + 1
    if abs((n_saves - 1) * save_every - duration) > 1e-9 * max(
        1.0, abs(duration)
    ):
        raise ValueError("duration must be a whole number of save intervals")
    if n_saves < 2:
        raise ValueError("duration must cover at least one save interval")
    if dt0 is None:
        dt0 = save_every / 8.0
    save_rows = _check_save_rows(save_rows, n_rows)
    if jax.default_backend() not in ("tpu",):
        saves, stats = ensemble_solve_kernel_adaptive_reference(
            rhs, y0_rows, p_rows, duration=duration, save_every=save_every,
            rtol=rtol, atol=atol, dt0=dt0, steps_per_save=steps_per_save,
            method=method, t0=t0,
        )
        picked = saves.astype(save_dtype)[:, list(save_rows), :]
        if padded_rows:
            picked = _pad_save_rows(picked)
        return picked, stats
    if block_b is None:
        block_b = pick_block_b(batch)
    if batch % block_b:
        raise ValueError(
            f"batch {batch} must divide into {block_b}-lane blocks"
        )
    saves, flags = _solve_pallas_adaptive(
        y0_rows, p_rows, rhs=rhs, duration=float(duration),
        save_every=float(save_every), steps_per_save=int(steps_per_save),
        rtol=float(rtol), atol=float(atol), dt0=float(dt0),
        block_b=int(block_b), method=method, t0=float(t0),
        save_dtype=jnp.dtype(save_dtype).name, save_rows=save_rows,
        padded_rows=bool(padded_rows),
    )
    stats = {
        "exhausted_intervals": flags[:, 0, 0],
        "n_accepted": flags[:, 0, 1],
        "n_rejected": flags[:, 0, 2],
    }
    return saves, stats


def ensemble_solve_kernel_adaptive_reference(
    rhs, y0_rows, p_rows=None, *, duration, save_every=1.0, rtol=1e-4,
    atol=1e-6, dt0=None, steps_per_save=8, method="bosh3", t0=0.0,
):
    """Pure-JAX lockstep reference (one global block) + CPU fallback.

    Same algorithm as ``_solve_kernel_adaptive`` -- shared scalar dt over
    the WHOLE ensemble, max-of-member-RMS controller norm, save-point
    clamping, per-interval attempt budgets -- so with ``block_b == batch``
    the kernel makes identical controller decisions (interpret-mode
    equivalence tests rely on this). Returns ``(saves, stats)`` with
    ``(1,)``-shaped stats arrays (one global block).
    """
    a, b, e, c, n_stages, err_order = _ADAPTIVE_METHODS[method]
    y0_rows = jnp.asarray(y0_rows, jnp.float32)
    n_rows, batch = y0_rows.shape
    if p_rows is None:
        p_rows = jnp.zeros((0, batch), jnp.float32)
    p_rows = jnp.asarray(p_rows, jnp.float32)  # kernel parity: f32 math
    p = [p_rows[r] for r in range(p_rows.shape[0])]
    n_saves = int(round(duration / save_every)) + 1
    k = int(steps_per_save)
    k_first = max(4 * k, 32)
    dt0 = float(save_every / 8.0 if dt0 is None else dt0)
    eps = 1e-6 * max(float(save_every), 1.0)
    f32 = jnp.float32
    i32 = jnp.int32

    def attempt(_, carry):
        t, dt_next, y, f0, na, nr, s_end = carry
        remaining = s_end - t
        active = remaining > eps
        dt_used = jnp.minimum(dt_next, remaining)
        landing = dt_used >= remaining - eps
        y_new, err, k_last = _rk_embedded_step_rows(
            rhs, list(y), p, t, dt_used, a, b, e, c, n_stages, f0=list(f0)
        )
        sq = None
        for r in range(n_rows):
            sc = atol + rtol * jnp.maximum(jnp.abs(y[r]), jnp.abs(y_new[r]))
            q = err[r] / sc
            sq = q * q if sq is None else sq + q * q
        norm = jnp.max(jnp.sqrt(sq * (1.0 / n_rows)))
        ok = jnp.isfinite(norm)
        safe = jnp.maximum(norm, jnp.asarray(1e-30, f32))
        factor = jnp.clip(
            0.9 * jnp.exp(jnp.log(safe) * (-1.0 / err_order)), 0.2, 10.0
        )
        factor = jnp.where(ok, factor, jnp.asarray(0.2, f32))
        good = ok & (norm <= 1.0)
        acc = active & good
        dt_new = jnp.where(landing & good, dt_next, dt_used * factor)
        dt_new = jnp.where(active, dt_new, dt_next)
        y_out = tuple(
            jnp.where(acc, yn, yo) for yn, yo in zip(y_new, y)
        )
        # FSAL carry mirrors the kernel: k_last becomes f0 on ACCEPT,
        # unchanged otherwise (exact after a REJECT: (t, y) unchanged)
        f_out = tuple(
            jnp.where(acc, kn, fo) for kn, fo in zip(k_last, f0)
        )
        t_new = jnp.where(acc, jnp.where(landing, s_end, t + dt_used), t)
        na = na + acc.astype(i32)
        nr = nr + (active & ~acc).astype(i32)
        return (t_new, dt_new, y_out, f_out, na, nr, s_end)

    def run_interval(carry, s_end, k_attempts):
        t, dt, y, f0, na, nr, bad = carry
        t, dt, y, f0, na, nr, _ = jax.lax.fori_loop(
            0, k_attempts, attempt, (t, dt, y, f0, na, nr, s_end)
        )
        reached = t >= s_end - eps
        bad = bad + (~reached).astype(i32)
        return (t, dt, y, f0, na, nr, bad), reached

    y = tuple(y0_rows[r] for r in range(n_rows))
    f_init = tuple(rhs(list(y), p, jnp.asarray(t0, f32)))
    carry = (
        jnp.asarray(t0, f32), jnp.asarray(dt0, f32), y, f_init,
        jnp.zeros((), i32), jnp.zeros((), i32), jnp.zeros((), i32),
    )
    carry, reached1 = run_interval(
        carry, jnp.asarray(t0 + save_every, f32), k_first
    )
    first = jnp.stack(carry[2], axis=0)
    first = jnp.where(reached1, first, jnp.full_like(first, jnp.nan))

    def outer(carry, s):
        s_end = t0 + s * save_every
        carry, reached = run_interval(carry, s_end, k)
        rows = jnp.stack(carry[2], axis=0)
        return carry, jnp.where(reached, rows, jnp.full_like(rows, jnp.nan))

    carry, rest = jax.lax.scan(
        outer, carry, jnp.arange(2, n_saves, dtype=f32)
    )
    saves = jnp.concatenate([y0_rows[None], first[None], rest], axis=0)
    _, _, _, _, na, nr, bad = carry
    stats = {
        "exhausted_intervals": bad[None],
        "n_accepted": na[None],
        "n_rejected": nr[None],
    }
    return saves, stats
