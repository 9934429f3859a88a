"""Whole-solve-in-VMEM Pallas kernel for multi-strain SEIRS ensembles.

Layout: the ensemble axis is the TPU *lane* axis. The packed state is a
(D, B) array -- D = A + 4*A*K compartment rows (A age groups, K strains,
compartments s/e/i/r/c), B ensemble members -- tiled over a 1-D grid of
batch blocks. Each Pallas program:

1. loads its (D, B_tile) state block into VMEM once,
2. runs `n_steps` constant-step Tsit5 steps (7 stages unrolled as dense VPU
   ops; the time loop itself is a rolled fori_loop -- unrolling steps in
   Python explodes compile time) with per-member parameters as extra lane
   rows, so strain heterogeneity across the ensemble is free,
3. DMAs the state to the HBM output buffer every `save_stride` steps
   (row counts padded to the 8-sublane f32 tile for aligned DMA slices).

Compared with the generic XLA-scan path, the hot loop performs *zero* HBM
traffic: state + stages live entirely in VMEM, which is the speed-of-light
regime for this arithmetic-intensity-poor workload (measured ~150-250k
trajectories/sec for 10k x 200-day ensembles on one v5e chip, ~10x the
XLA adaptive path, self-converged to ~2e-6 at dt=0.5).

All entry points take ``n_age``/``n_strain`` so any member of the
multi-strain SEIRS family uses the same kernel; the defaults match the
benchmark workload (2 ages x 3 strains). A pure-jnp
`ensemble_solve_reference` implements the identical lane-major computation
for correctness diffing and CPU fallback.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ode.solvers import Tsit5

#: benchmark-workload defaults
A_DIM = 2
K_DIM = 3
D_ROWS = A_DIM + 4 * A_DIM * K_DIM


def _d_rows(n_age: int, n_strain: int) -> int:
    return n_age + 4 * n_age * n_strain


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def pick_block_b(batch: int) -> int:
    """Largest measured-good lane-block width dividing ``batch``.

    Grid blocks run sequentially on the single TensorCore, so the
    per-RK-step loop overhead is paid once per block per step; wider lane
    blocks amortize it. Measured at B~80k (v5e-1, 200d multistrain,
    probes/probe_multistrain_block_sweep.py): 2048 lanes is the sweet
    spot -- 1.24M traj/s vs 1.19M @1024, 1.13M @4096 (past ~2048 the
    block's VMEM working set stops fitting the vector unit's appetite),
    657k @256. Member math is block-size-invariant: each member occupies
    one lane for the whole solve.
    """
    return next((b for b in (2048, 1024, 512, 256) if batch % b == 0), 256)


def pack_state(
    y0: Tuple[jnp.ndarray, ...], batch: int, n_age: int = A_DIM, n_strain: int = K_DIM
) -> jnp.ndarray:
    """(s (A,), e/i/r/c (A,K)) -> packed (D, B) with the state broadcast."""
    s, e, i, r, c = y0
    flat = jnp.concatenate(
        [s.reshape(-1), e.reshape(-1), i.reshape(-1), r.reshape(-1), c.reshape(-1)]
    )
    d = _d_rows(n_age, n_strain)
    assert flat.shape[0] == d, f"state does not match {n_age} ages x {n_strain} strains"
    return jnp.broadcast_to(flat[:, None], (d, batch)).astype(jnp.float32)


def pack_params(
    beta, sigma, gamma, omega, batch: int, n_strain: int = K_DIM
) -> jnp.ndarray:
    """Per-strain rates (each (K,) or (B, K)) -> packed (4*K, B) rows."""

    def rows(x):
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None, :], (batch, n_strain))
        return x.T  # (K, B)

    return jnp.concatenate([rows(beta), rows(sigma), rows(gamma), rows(omega)])


def unpack_saves(saves: jnp.ndarray, n_age: int = A_DIM, n_strain: int = K_DIM):
    """(T, D, B) packed saves -> tuple of (T, B, ...) compartment arrays."""
    T, _, B = saves.shape
    s = saves[:, :n_age, :].transpose(0, 2, 1)  # (T, B, A)
    blocks = []
    off = n_age
    ak = n_age * n_strain
    for _ in range(4):
        blk = saves[:, off : off + ak, :]
        blocks.append(blk.reshape(T, n_age, n_strain, B).transpose(0, 3, 1, 2))
        off += ak
    e, i, r, c = blocks
    return s, e, i, r, c


# ---------------------------------------------------------------------------
# the fused RHS on lane-major rows (shared by kernel and reference)
# ---------------------------------------------------------------------------


def _rhs_rows(y, contact, beta, sigma, gamma, omega, n_age, n_strain):
    """d/dt of the packed (D, B) state; all ops are (B,)-lane vectors.

    ``beta``/... are lists of K (B,) rows; ``contact`` is a static tuple.
    """
    ak = n_age * n_strain
    s = [y[a] for a in range(n_age)]
    e = [y[n_age + idx] for idx in range(ak)]
    i = [y[n_age + ak + idx] for idx in range(ak)]
    r = [y[n_age + 2 * ak + idx] for idx in range(ak)]

    n = []
    for a in range(n_age):
        tot = s[a]
        for k in range(n_strain):
            idx = a * n_strain + k
            tot = tot + e[idx] + i[idx] + r[idx]
        n.append(tot)

    inv_n = [1.0 / na for na in n]
    d_rows = _d_rows(n_age, n_strain)
    d = [None] * d_rows
    ds = [jnp.zeros_like(s[0]) for _ in range(n_age)]
    for a in range(n_age):
        for k in range(n_strain):
            idx = a * n_strain + k
            mixed = jnp.zeros_like(s[0])
            for b in range(n_age):
                mixed = mixed + contact[a][b] * i[b * n_strain + k] * inv_n[b]
            foi = beta[k] * mixed
            new_inf = foi * s[a]
            e_out = sigma[k] * e[idx]
            i_out = gamma[k] * i[idx]
            r_out = omega[k] * r[idx]
            ds[a] = ds[a] - new_inf + r_out
            d[n_age + idx] = new_inf - e_out  # de
            d[n_age + ak + idx] = e_out - i_out  # di
            d[n_age + 2 * ak + idx] = i_out - r_out  # dr
            d[n_age + 3 * ak + idx] = new_inf  # dc
    for a in range(n_age):
        d[a] = ds[a]
    return d


def _tsit5_step_rows(y_rows, dt, contact, beta, sigma, gamma, omega, n_age, n_strain):
    """One constant-step Tsit5 update on a list of D (B,)-rows."""
    tab = Tsit5
    d_rows = _d_rows(n_age, n_strain)
    ks = []
    for stage in range(6):  # b[6] == 0, so stage 7 never contributes
        if stage == 0:
            y_stage = y_rows
        else:
            coeffs = tab.a[stage - 1]
            y_stage = [
                y_rows[row]
                + dt
                * sum(
                    coeffs[j] * ks[j][row]
                    for j in range(stage)
                    if coeffs[j] != 0.0
                )
                for row in range(d_rows)
            ]
        ks.append(
            _rhs_rows(y_stage, contact, beta, sigma, gamma, omega, n_age, n_strain)
        )
    return [
        y_rows[row]
        + dt * sum(tab.b[j] * ks[j][row] for j in range(6) if tab.b[j] != 0.0)
        for row in range(d_rows)
    ]


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
    contact,
    dt: float,
    n_steps: int,
    save_stride: int,
    n_age: int,
    n_strain: int,
):
    d_rows = _d_rows(n_age, n_strain)
    d_pad = _pad8(d_rows)
    beta = [p_ref[k, :] for k in range(n_strain)]
    sigma = [p_ref[n_strain + k, :] for k in range(n_strain)]
    gamma = [p_ref[2 * n_strain + k, :] for k in range(n_strain)]
    omega = [p_ref[3 * n_strain + k, :] for k in range(n_strain)]

    i = pl.program_id(0)
    block_b = scratch.shape[1]

    def save(slot, rows):
        for row in range(d_rows):
            scratch[row, :] = rows[row]
        dma = pltpu.make_async_copy(
            scratch,
            out_ref.at[slot, :, pl.ds(i * block_b, block_b)],
            sem,
        )
        dma.start()
        dma.wait()

    for row in range(d_rows, d_pad):  # zero the padding rows once
        scratch[row, :] = jnp.zeros_like(scratch[row, :])
    y = [y_ref[row, :] for row in range(d_rows)]
    save(0, y)

    # rolled time loop (unrolling n_steps would explode compile time);
    # one Tsit5 update (stages unrolled) + a predicated save per iteration
    def body(step, rows):
        rows = _tsit5_step_rows(
            list(rows), dt, contact, beta, sigma, gamma, omega, n_age, n_strain
        )

        @pl.when(step % save_stride == 0)
        def _():
            save(step // save_stride, rows)

        return tuple(rows)

    jax.lax.fori_loop(1, n_steps + 1, body, tuple(y))


@functools.partial(
    jax.jit,
    static_argnames=(
        "duration",
        "dt",
        "save_every",
        "block_b",
        "contact_tuple",
        "n_age",
        "n_strain",
    ),
)
def _solve_pallas(
    y_packed,
    p_packed,
    *,
    duration: float,
    dt: float,
    save_every: float,
    block_b: int,
    contact_tuple,
    n_age: int,
    n_strain: int,
):
    _, B = y_packed.shape
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    n_saves = n_steps // save_stride + 1
    d_rows = _d_rows(n_age, n_strain)
    d_pad = _pad8(d_rows)
    p_pad_rows = _pad8(4 * n_strain)

    # pad rows to the f32 sublane tile so HBM DMA slices are aligned
    y_pad = jnp.zeros((d_pad, B), jnp.float32).at[:d_rows].set(y_packed)
    p_pad = jnp.zeros((p_pad_rows, B), jnp.float32).at[: 4 * n_strain].set(p_packed)

    kernel = functools.partial(
        _solve_kernel,
        contact=contact_tuple,
        dt=dt,
        n_steps=n_steps,
        save_stride=save_stride,
        n_age=n_age,
        n_strain=n_strain,
    )
    grid = (B // block_b,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_saves, d_pad, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d_pad, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (p_pad_rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((d_pad, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(y_pad, p_pad)
    return out[:, :d_rows, :]


def ensemble_solve_tsit5(
    y0,
    beta,
    sigma,
    gamma,
    omega,
    contact,
    *,
    batch: int,
    duration: float,
    dt: float = 0.5,
    save_every: float = 1.0,
    block_b: int | None = None,
    n_age: int = A_DIM,
    n_strain: int = K_DIM,
):
    """Solve a B-wide multi-strain SEIRS ensemble fully inside Pallas.

    Parameters may be (K,) (shared) or (B, K) (per-member). Returns the
    packed (n_saves, D, B) buffer; use :func:`unpack_saves`. On non-TPU
    backends this transparently falls back to the identical lax.scan
    reference implementation.

    ``block_b=None`` auto-picks via :func:`pick_block_b` (largest
    measured-good lane-block width dividing ``batch``; 2048 is the v5e
    sweet spot -- 657k -> 1,240k traj/s at B~80k vs the old 256 default).
    """
    if jax.default_backend() not in ("tpu",):
        return ensemble_solve_reference(
            y0, beta, sigma, gamma, omega, contact,
            batch=batch, duration=duration, dt=dt, save_every=save_every,
            n_age=n_age, n_strain=n_strain,
        )
    if block_b is None:
        block_b = pick_block_b(batch)
    assert batch % block_b == 0, "batch must divide into lane blocks"
    y_packed = pack_state(y0, batch, n_age, n_strain)
    p_packed = pack_params(beta, sigma, gamma, omega, batch, n_strain)
    contact_tuple = tuple(
        tuple(float(v) for v in row) for row in np.asarray(contact)
    )
    return _solve_pallas(
        y_packed,
        p_packed,
        duration=float(duration),
        dt=float(dt),
        save_every=float(save_every),
        block_b=block_b,
        contact_tuple=contact_tuple,
        n_age=n_age,
        n_strain=n_strain,
    )


def ensemble_solve_reference(
    y0,
    beta,
    sigma,
    gamma,
    omega,
    contact,
    *,
    batch: int,
    duration: float,
    dt: float = 0.5,
    save_every: float = 1.0,
    n_age: int = A_DIM,
    n_strain: int = K_DIM,
):
    """Identical lane-major computation as a plain lax.scan (CPU/correctness)."""
    y_packed = pack_state(y0, batch, n_age, n_strain)
    p_packed = pack_params(beta, sigma, gamma, omega, batch, n_strain)
    contact_tuple = tuple(
        tuple(float(v) for v in row) for row in np.asarray(contact)
    )
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    d_rows = _d_rows(n_age, n_strain)

    beta_r = [p_packed[k] for k in range(n_strain)]
    sigma_r = [p_packed[n_strain + k] for k in range(n_strain)]
    gamma_r = [p_packed[2 * n_strain + k] for k in range(n_strain)]
    omega_r = [p_packed[3 * n_strain + k] for k in range(n_strain)]

    def stride_fn(y, _):
        rows = [y[r] for r in range(d_rows)]
        for _ in range(save_stride):
            rows = _tsit5_step_rows(
                rows, dt, contact_tuple, beta_r, sigma_r, gamma_r, omega_r,
                n_age, n_strain,
            )
        y = jnp.stack(rows)
        return y, y

    n_saves = n_steps // save_stride
    _, saves = jax.lax.scan(stride_fn, y_packed, None, length=n_saves)
    return jnp.concatenate([y_packed[None], saves], axis=0)


__all__ = [
    "pack_state",
    "pack_params",
    "unpack_saves",
    "ensemble_solve_tsit5",
    "ensemble_solve_reference",
]


# ---------------------------------------------------------------------------
# 2-D tile kernel: full (rows x lanes) VPU utilization
# ---------------------------------------------------------------------------
# Hypothesis: the row-list kernel above performs every arithmetic op on a
# single (B,) lane vector -- potentially one of the VPU's 8 sublanes per op
# -- so a variant keeping the state as one (D2, B) block with whole-tile
# ops (aligned compartment groups, per-(age,strain)-ROW rate tensors
# precomputed outside the kernel) should fill all sublanes.
#
# MEASURED OUTCOME (v5e-1, 9984 x 200d, dt=0.5): 117k traj/s -- SLOWER than
# the row kernel (174k) and the XLA batch-leading path (~250k). The
# unaligned K-row sublane slices and small concats that the contact-mixing
# step needs (3-row windows at offsets 0/3 inside 8-row tiles) lower to
# Mosaic shift/copy sequences that cost more than the utilization gain;
# Mosaic evidently already packs the row kernel's independent row ops well.
# Kept as a correctness-tested negative result: the honest conclusion for
# this small-state workload stands -- plain XLA jit(vmap) is the fastest
# path (bench.py measures all of them).


def _blk8(n: int) -> int:
    return -(-n // 8) * 8


def _offsets_2d(n_age: int, n_strain: int):
    """Aligned row offsets for the s/e/i/r/c compartment groups."""
    sa = _blk8(n_age)
    sak = _blk8(n_age * n_strain)
    offs = (0, sa, sa + sak, sa + 2 * sak, sa + 3 * sak)
    return offs, sa + 4 * sak


def pack_state_2d(y0, batch: int, n_age: int = A_DIM, n_strain: int = K_DIM):
    """(s (A,), e/i/r/c (A,K)) -> aligned (D2, B) packed state."""
    s, e, i, r, c = y0
    offs, d2 = _offsets_2d(n_age, n_strain)
    buf = jnp.zeros((d2, batch), jnp.float32)
    for off, x in zip(offs, (s, e, i, r, c)):
        flat = jnp.asarray(x, jnp.float32).reshape(-1)
        buf = buf.at[off : off + flat.shape[0], :].set(
            jnp.broadcast_to(flat[:, None], (flat.shape[0], batch))
        )
    return buf


def pack_rates_2d(
    beta, sigma, gamma, omega, batch: int,
    n_age: int = A_DIM, n_strain: int = K_DIM,
):
    """Per-strain rates -> per-(age,strain)-ROW tensors, one aligned
    (sak, B) section each, stacked to (4*sak, B).

    Accepts (K,) shared or (B, K) per-member arrays; the row replication
    across ages happens HERE (host-side trace time), not in the kernel.
    """
    ak = n_age * n_strain
    sak = _blk8(ak)

    def section(x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None, :], (batch, n_strain))
        rows = jnp.tile(x.T, (n_age, 1))  # (AK, B): row a*K+k = rate[k]
        return jnp.zeros((sak, batch), jnp.float32).at[:ak].set(rows)

    return jnp.concatenate(
        [section(beta), section(sigma), section(gamma), section(omega)]
    )


def unpack_saves_2d(saves, n_age: int = A_DIM, n_strain: int = K_DIM):
    """(T, D2, B) aligned saves -> tuple of (T, B, ...) compartments."""
    offs, _ = _offsets_2d(n_age, n_strain)
    T, _, B = saves.shape
    ak = n_age * n_strain
    s = saves[:, offs[0] : offs[0] + n_age, :].transpose(0, 2, 1)
    out = [s]
    for off in offs[1:]:
        blk = saves[:, off : off + ak, :]
        out.append(blk.reshape(T, n_age, n_strain, B).transpose(0, 3, 1, 2))
    return tuple(out)  # s, e, i, r, c


def _rhs_2d(y, beta_r, sigma_r, gamma_r, omega_r, contact, n_age, n_strain):
    """d/dt of the aligned (D2, B) state as whole-tile 2-D ops."""
    A, K = n_age, n_strain
    ak = A * K
    offs, _ = _offsets_2d(A, K)
    sa = _blk8(A)
    sak = _blk8(ak)
    B = y.shape[1]
    s = y[offs[0] : offs[0] + sa]
    e = y[offs[1] : offs[1] + sak]
    i = y[offs[2] : offs[2] + sak]
    r = y[offs[3] : offs[3] + sak]

    eir = e + i + r  # (sak, B) one tile op for the population sums
    inv_n = [
        1.0
        / (
            s[a : a + 1]
            + jnp.sum(eir[a * K : (a + 1) * K], axis=0, keepdims=True)
        )
        for a in range(A)
    ]
    i_on = jnp.concatenate(
        [i[a * K : (a + 1) * K] * inv_n[a] for a in range(A)], axis=0
    )  # (AK, B)
    mixed = jnp.concatenate(
        [
            sum(contact[a][b] * i_on[b * K : (b + 1) * K] for b in range(A))
            for a in range(A)
        ],
        axis=0,
    )  # (AK, B)
    s_rep = jnp.concatenate(
        [jnp.broadcast_to(s[a : a + 1], (K, B)) for a in range(A)], axis=0
    )
    new_inf = beta_r[:ak] * mixed * s_rep  # (AK, B)

    e_out = sigma_r[:ak] * e[:ak]
    i_out = gamma_r[:ak] * i[:ak]
    r_out = omega_r[:ak] * r[:ak]

    ds_rows = jnp.concatenate(
        [
            jnp.sum(
                r_out[a * K : (a + 1) * K] - new_inf[a * K : (a + 1) * K],
                axis=0,
                keepdims=True,
            )
            for a in range(A)
        ],
        axis=0,
    )  # (A, B)

    def padto(x, rows):
        extra = rows - x.shape[0]
        if extra == 0:
            return x
        return jnp.concatenate([x, jnp.zeros((extra, B), x.dtype)], axis=0)

    return jnp.concatenate(
        [
            padto(ds_rows, sa),
            padto(new_inf - e_out, sak),
            padto(e_out - i_out, sak),
            padto(i_out - r_out, sak),
            padto(new_inf, sak),
        ],
        axis=0,
    )


def _tsit5_step_2d(y, dt, rhs):
    """One constant-step Tsit5 update on the whole (D2, B) block."""
    tab = Tsit5
    ks = []
    for stage in range(6):  # b[6] == 0
        if stage == 0:
            ys = y
        else:
            ys = y
            for j, c in enumerate(tab.a[stage - 1]):
                if c != 0.0:
                    ys = ys + (dt * c) * ks[j]
        ks.append(rhs(ys))
    out = y
    for j, b in enumerate(tab.b[:6]):
        if b != 0.0:
            out = out + (dt * b) * ks[j]
    return out


def _solve_kernel_2d(
    y_ref,
    p_ref,
    out_ref,
    scratch,
    sem,
    *,
    contact,
    dt: float,
    n_steps: int,
    save_stride: int,
    n_age: int,
    n_strain: int,
):
    sak = _blk8(n_age * n_strain)
    beta_r = p_ref[0:sak, :]
    sigma_r = p_ref[sak : 2 * sak, :]
    gamma_r = p_ref[2 * sak : 3 * sak, :]
    omega_r = p_ref[3 * sak : 4 * sak, :]

    def rhs(y):
        return _rhs_2d(
            y, beta_r, sigma_r, gamma_r, omega_r, contact, n_age, n_strain
        )

    i = pl.program_id(0)
    block_b = scratch.shape[1]

    def save(slot, y):
        scratch[:, :] = y
        dma = pltpu.make_async_copy(
            scratch,
            out_ref.at[slot, :, pl.ds(i * block_b, block_b)],
            sem,
        )
        dma.start()
        dma.wait()

    y = y_ref[:, :]
    save(0, y)

    def body(step, y):
        y = _tsit5_step_2d(y, dt, rhs)

        @pl.when(step % save_stride == 0)
        def _():
            save(step // save_stride, y)

        return y

    jax.lax.fori_loop(1, n_steps + 1, body, y)


@functools.partial(
    jax.jit,
    static_argnames=(
        "duration",
        "dt",
        "save_every",
        "block_b",
        "contact_tuple",
        "n_age",
        "n_strain",
    ),
)
def _solve_pallas_2d(
    y_packed,
    p_packed,
    *,
    duration: float,
    dt: float,
    save_every: float,
    block_b: int,
    contact_tuple,
    n_age: int,
    n_strain: int,
):
    _, B = y_packed.shape
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    n_saves = n_steps // save_stride + 1
    d2 = y_packed.shape[0]
    p_rows = p_packed.shape[0]

    kernel = functools.partial(
        _solve_kernel_2d,
        contact=contact_tuple,
        dt=dt,
        n_steps=n_steps,
        save_stride=save_stride,
        n_age=n_age,
        n_strain=n_strain,
    )
    grid = (B // block_b,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_saves, d2, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d2, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (p_rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((d2, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(y_packed, p_packed)


def ensemble_solve_tsit5_2d(
    y0,
    beta,
    sigma,
    gamma,
    omega,
    contact,
    *,
    batch: int,
    duration: float,
    dt: float = 0.5,
    save_every: float = 1.0,
    block_b: int = 256,
    n_age: int = A_DIM,
    n_strain: int = K_DIM,
):
    """Whole-solve ensemble kernel with full-tile 2-D arithmetic.

    Same contract as :func:`ensemble_solve_tsit5` but returns the ALIGNED
    packed buffer -- use :func:`unpack_saves_2d`. Falls back to the
    identical 2-D math under lax.scan off-TPU.
    """
    y_packed = pack_state_2d(y0, batch, n_age, n_strain)
    p_packed = pack_rates_2d(beta, sigma, gamma, omega, batch, n_age, n_strain)
    contact_tuple = tuple(
        tuple(float(v) for v in row) for row in np.asarray(contact)
    )
    if jax.default_backend() not in ("tpu",):
        return _solve_2d_reference(
            y_packed, p_packed, duration=float(duration), dt=float(dt),
            save_every=float(save_every), contact_tuple=contact_tuple,
            n_age=n_age, n_strain=n_strain,
        )
    assert batch % block_b == 0, "batch must divide into lane blocks"
    return _solve_pallas_2d(
        y_packed,
        p_packed,
        duration=float(duration),
        dt=float(dt),
        save_every=float(save_every),
        block_b=block_b,
        contact_tuple=contact_tuple,
        n_age=n_age,
        n_strain=n_strain,
    )


def _solve_2d_reference(
    y_packed, p_packed, *, duration, dt, save_every, contact_tuple,
    n_age, n_strain,
):
    sak = _blk8(n_age * n_strain)
    beta_r = p_packed[0:sak]
    sigma_r = p_packed[sak : 2 * sak]
    gamma_r = p_packed[2 * sak : 3 * sak]
    omega_r = p_packed[3 * sak : 4 * sak]

    def rhs(y):
        return _rhs_2d(
            y, beta_r, sigma_r, gamma_r, omega_r, contact_tuple,
            n_age, n_strain,
        )

    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))

    def stride_fn(y, _):
        for _ in range(save_stride):
            y = _tsit5_step_2d(y, dt, rhs)
        return y, y

    _, saves = jax.lax.scan(
        stride_fn, y_packed, None, length=n_steps // save_stride
    )
    return jnp.concatenate([y_packed[None], saves], axis=0)


__all__ += [
    "pack_state_2d",
    "pack_rates_2d",
    "unpack_saves_2d",
    "ensemble_solve_tsit5_2d",
]
