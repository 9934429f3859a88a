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
):
    a, b, c, n_stages = tableau
    d_pad = scratch.shape[0]
    i = pl.program_id(0)
    block_b = scratch.shape[1]
    p = [p_ref[r, :] for r in range(n_params)]

    def save(slot, rows):
        for r in range(n_rows):
            scratch[r, :] = rows[r]
        dma = pltpu.make_async_copy(
            scratch,
            out_ref.at[slot, :, pl.ds(i * block_b, block_b)],
            sem,
        )
        dma.start()
        dma.wait()

    for r in range(n_rows, d_pad):  # zero padding rows once
        scratch[r, :] = jnp.zeros_like(scratch[r, :])
    y = [y_ref[r, :] for r in range(n_rows)]
    save(0, y)

    # rolled time loop (unrolling n_steps explodes compile time); stages
    # unrolled inside; predicated save on the stride
    def body(step, rows):
        t = t0 + (step - 1).astype(jnp.float32) * dt
        rows = _rk_step_rows(rhs, list(rows), p, t, dt, a, b, c, n_stages)

        @pl.when(step % save_stride == 0)
        def _():
            save(step // save_stride, rows)

        return tuple(rows)

    jax.lax.fori_loop(1, n_steps + 1, body, tuple(y))


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

    Returns ``(n_saves, R, B)`` f32 saves (slice rows / :func:`unpack_rows`).
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

    if jax.default_backend() not in ("tpu",):
        return ensemble_solve_kernel_reference(
            rhs, y0_rows, p_rows, duration=duration, dt=dt,
            save_every=save_every, method=method, t0=t0,
        )
    if block_b is None:
        block_b = pick_block_b(batch)
    if batch % block_b:
        raise ValueError(f"batch {batch} must divide into {block_b}-lane blocks")
    return _solve_pallas(
        y0_rows, p_rows, rhs=rhs, duration=float(duration), dt=float(dt),
        save_every=float(save_every), block_b=int(block_b), method=method,
        t0=float(t0),
    )


@functools.partial(
    jax.jit,
    static_argnames=("rhs", "duration", "dt", "save_every", "block_b",
                     "method", "t0"),
)
def _solve_pallas(
    y0_rows, p_rows, *, rhs, duration, dt, save_every, block_b, method, t0
):
    n_rows, batch = y0_rows.shape
    n_params = p_rows.shape[0]
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    n_saves = n_steps // save_stride + 1
    d_pad = _pad8(n_rows)
    p_pad = _pad8(max(n_params, 1))

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
    )
    grid = (batch // block_b,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_saves, d_pad, batch), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((d_pad, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(y_padded, p_padded)
    return out[:, :n_rows, :]


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
