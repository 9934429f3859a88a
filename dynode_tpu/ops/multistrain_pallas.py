"""Whole-solve-in-VMEM Pallas kernel for multi-strain SEIRS ensembles.

Layout: the ensemble axis is the TPU *lane* axis. The packed state is a
(D, B) array -- D = A + 4*A*K compartment rows, B ensemble members -- tiled
over a 1-D grid of batch blocks. Each Pallas program:

1. loads its (D, B_tile) state block into VMEM once,
2. runs `n_steps` constant-step Tsit5 steps with all 7 stages unrolled as
   dense VPU ops (per-member parameters are (param, B_tile) rows, so strain
   heterogeneity across the ensemble is free),
3. DMAs the state to the HBM output buffer every `save_stride` steps.

Compared with the generic XLA-scan path, the hot loop performs *zero* HBM
traffic: state + stages live entirely in VMEM (~0.5 MB per tile), which is
the speed-of-light regime for this arithmetic-intensity-poor workload.

A pure-jnp `ensemble_solve_reference` implements the identical lane-major
computation for correctness diffing and CPU fallback.
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ode.solvers import Tsit5

# flagship model dims (the benchmark workload): A age groups x K strains
A_DIM = 2
K_DIM = 3
D_ROWS = A_DIM + 4 * A_DIM * K_DIM  # s rows + e/i/r/c blocks
D_PAD = -(-D_ROWS // 8) * 8  # HBM slices must align to the (8,128) f32 tiling
P_ROWS = 4 * K_DIM
P_PAD = -(-P_ROWS // 8) * 8


def pack_state(y0: Tuple[jnp.ndarray, ...], batch: int) -> jnp.ndarray:
    """(s (A,), e/i/r/c (A,K)) -> packed (D, B) with the state broadcast."""
    s, e, i, r, c = y0
    flat = jnp.concatenate(
        [s.reshape(-1), e.reshape(-1), i.reshape(-1), r.reshape(-1), c.reshape(-1)]
    )
    return jnp.broadcast_to(flat[:, None], (D_ROWS, batch)).astype(jnp.float32)


def pack_params(beta, sigma, gamma, omega, batch: int) -> jnp.ndarray:
    """Per-strain rates (each (K,) or (B, K)) -> packed (4*K, B) rows."""

    def rows(x):
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None, :], (batch, K_DIM))
        return x.T  # (K, B)

    return jnp.concatenate([rows(beta), rows(sigma), rows(gamma), rows(omega)])


def unpack_saves(saves: jnp.ndarray):
    """(T, D, B) packed saves -> tuple of (T, B, ...) compartment arrays."""
    T, _, B = saves.shape
    s = saves[:, :A_DIM, :].transpose(0, 2, 1)  # (T, B, A)
    blocks = []
    off = A_DIM
    for _ in range(4):
        blk = saves[:, off : off + A_DIM * K_DIM, :]
        blocks.append(
            blk.reshape(T, A_DIM, K_DIM, B).transpose(0, 3, 1, 2)
        )  # (T, B, A, K)
        off += A_DIM * K_DIM
    e, i, r, c = blocks
    return s, e, i, r, c


# ---------------------------------------------------------------------------
# the fused RHS on lane-major rows (shared by kernel and reference)
# ---------------------------------------------------------------------------


def _rhs_rows(y, contact, beta, sigma, gamma, omega):
    """d/dt of the packed (D, B) state; all ops are (B,)-lane vectors.

    ``beta``/... are (K, B); ``contact`` is a static (A, A) numpy array.
    """
    AK = A_DIM * K_DIM
    s = [y[a] for a in range(A_DIM)]
    e = [y[A_DIM + idx] for idx in range(AK)]
    i = [y[A_DIM + AK + idx] for idx in range(AK)]
    r = [y[A_DIM + 2 * AK + idx] for idx in range(AK)]

    n = []
    for a in range(A_DIM):
        tot = s[a]
        for k in range(K_DIM):
            idx = a * K_DIM + k
            tot = tot + e[idx] + i[idx] + r[idx]
        n.append(tot)

    inv_n = [1.0 / na for na in n]
    d = [None] * D_ROWS
    ds = [jnp.zeros_like(s[0]) for _ in range(A_DIM)]
    for a in range(A_DIM):
        for k in range(K_DIM):
            idx = a * K_DIM + k
            mixed = jnp.zeros_like(s[0])
            for b in range(A_DIM):
                mixed = mixed + contact[a][b] * i[b * K_DIM + k] * inv_n[b]
            foi = beta[k] * mixed
            new_inf = foi * s[a]
            e_out = sigma[k] * e[idx]
            i_out = gamma[k] * i[idx]
            r_out = omega[k] * r[idx]
            ds[a] = ds[a] - new_inf + r_out
            d[A_DIM + idx] = new_inf - e_out  # de
            d[A_DIM + AK + idx] = e_out - i_out  # di
            d[A_DIM + 2 * AK + idx] = i_out - r_out  # dr
            d[A_DIM + 3 * AK + idx] = new_inf  # dc
    for a in range(A_DIM):
        d[a] = ds[a]
    return d


def _tsit5_step_rows(y_rows, dt, contact, beta, sigma, gamma, omega):
    """One constant-step Tsit5 update on a list of D (B,)-rows."""
    tab = Tsit5
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
                for row in range(D_ROWS)
            ]
        ks.append(_rhs_rows(y_stage, contact, beta, sigma, gamma, omega))
    return [
        y_rows[row]
        + dt * sum(tab.b[j] * ks[j][row] for j in range(6) if tab.b[j] != 0.0)
        for row in range(D_ROWS)
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
):
    beta = [p_ref[k, :] for k in range(K_DIM)]
    sigma = [p_ref[K_DIM + k, :] for k in range(K_DIM)]
    gamma = [p_ref[2 * K_DIM + k, :] for k in range(K_DIM)]
    omega = [p_ref[3 * K_DIM + k, :] for k in range(K_DIM)]

    i = pl.program_id(0)
    block_b = scratch.shape[1]

    def save(slot, rows):
        for row in range(D_ROWS):
            scratch[row, :] = rows[row]
        dma = pltpu.make_async_copy(
            scratch,
            out_ref.at[slot, :, pl.ds(i * block_b, block_b)],
            sem,
        )
        dma.start()
        dma.wait()

    for row in range(D_ROWS, D_PAD):  # zero the padding rows once
        scratch[row, :] = jnp.zeros_like(scratch[row, :])
    y = [y_ref[row, :] for row in range(D_ROWS)]
    save(0, y)

    # rolled time loop (unrolling n_steps would explode compile time);
    # one Tsit5 update (stages unrolled) + a predicated save per iteration
    def body(step, rows):
        rows = _tsit5_step_rows(
            list(rows), dt, contact, beta, sigma, gamma, omega
        )

        @pl.when(step % save_stride == 0)
        def _():
            save(step // save_stride, rows)

        return tuple(rows)

    jax.lax.fori_loop(1, n_steps + 1, body, tuple(y))


@functools.partial(
    jax.jit,
    static_argnames=("duration", "dt", "save_every", "block_b", "contact_tuple"),
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
):
    _, B = y_packed.shape
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    n_saves = n_steps // save_stride + 1
    contact = contact_tuple

    # pad rows to the f32 sublane tile so HBM DMA slices are aligned
    y_pad = jnp.zeros((D_PAD, B), jnp.float32).at[:D_ROWS].set(y_packed)
    p_pad = jnp.zeros((P_PAD, B), jnp.float32).at[:P_ROWS].set(p_packed)

    kernel = functools.partial(
        _solve_kernel,
        contact=contact,
        dt=dt,
        n_steps=n_steps,
        save_stride=save_stride,
    )
    grid = (B // block_b,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_saves, D_PAD, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (D_PAD, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (P_PAD, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((D_PAD, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(y_pad, p_pad)
    return out[:, :D_ROWS, :]


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
    block_b: int = 256,
):
    """Solve a B-wide multi-strain SEIRS ensemble fully inside Pallas.

    Parameters may be (K,) (shared) or (B, K) (per-member). Returns the
    packed (n_saves, D, B) buffer; use :func:`unpack_saves`. On non-TPU
    backends this transparently falls back to the identical lax.scan
    reference implementation.
    """
    if jax.default_backend() not in ("tpu",):
        return ensemble_solve_reference(
            y0, beta, sigma, gamma, omega, contact,
            batch=batch, duration=duration, dt=dt, save_every=save_every,
        )
    assert batch % block_b == 0, "batch must divide into lane blocks"
    y_packed = pack_state(y0, batch)
    p_packed = pack_params(beta, sigma, gamma, omega, batch)
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
):
    """Identical lane-major computation as a plain lax.scan (CPU/correctness)."""
    y_packed = pack_state(y0, batch)
    p_packed = pack_params(beta, sigma, gamma, omega, batch)
    contact_tuple = tuple(
        tuple(float(v) for v in row) for row in np.asarray(contact)
    )
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))

    beta_r = [p_packed[k] for k in range(K_DIM)]
    sigma_r = [p_packed[K_DIM + k] for k in range(K_DIM)]
    gamma_r = [p_packed[2 * K_DIM + k] for k in range(K_DIM)]
    omega_r = [p_packed[3 * K_DIM + k] for k in range(K_DIM)]

    def stride_fn(y, _):
        rows = [y[r] for r in range(D_ROWS)]
        for _ in range(save_stride):
            rows = _tsit5_step_rows(
                rows, dt, contact_tuple, beta_r, sigma_r, gamma_r, omega_r
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
