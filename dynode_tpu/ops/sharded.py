"""Multi-device (mesh) wrappers for the whole-solve ensemble kernels.

Ensemble members are embarrassingly parallel, so the scale-out story for
the Pallas kernels is ``shard_map`` over the mesh's member axis: the
member (lane) axis of every rows-layout array is split across devices and
each device launches the single-chip kernel on its local shard. No
collectives are needed -- the save buffers come back sharded the same way,
and downstream reductions (ensemble means, quantiles) run on the sharded
buffers with XLA inserting the cross-device reduce.

This closes the gap between the single-chip kernel headlines (bench.py)
and the v5e-8 mesh targets (SURVEY.md section 2.8, BASELINE.md): the
XLA engines scale through GSPMD sharding (``simulate_ensemble(mesh=)``,
``parallel/mesh.py``), and the kernels scale through these wrappers.

Numerics:

- constant-step kernels are member-math invariant to both the device split
  and the lane-block width (each member occupies one lane for the whole
  solve), so a sharded solve is bit-identical to the single-device solve.
- the ADAPTIVE kernels share one dt chain per lane block, so controller
  decisions depend on which members share a block. Pass an explicit
  ``block_b`` that divides the per-device batch to make the device split
  preserve block boundaries (bit-identical again); otherwise results agree
  only to the solve tolerance.

Off-TPU (e.g. the driver's 8-virtual-CPU-device dryrun) the underlying
entry points fall back to their pure-``lax`` references, which shard_map
partitions like any other JAX program -- the same code path validates the
partitioning logic without TPU hardware.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .generic_pallas import (
    ensemble_solve_kernel,
    ensemble_solve_kernel_adaptive,
)

__all__ = [
    "ensemble_solve_kernel_sharded",
    "ensemble_solve_kernel_adaptive_sharded",
    "seip_ensemble_solve_sharded",
    "seip_ensemble_solve_adaptive_sharded",
]


def _check_batch(batch: int, mesh: Mesh, axis_name: str) -> int:
    n_dev = mesh.shape[axis_name]
    if batch % n_dev:
        raise ValueError(
            f"ensemble width {batch} must divide over the {n_dev}-device "
            f"'{axis_name}' mesh axis"
        )
    return n_dev


def ensemble_solve_kernel_sharded(
    rhs: Callable,
    y0_rows: jnp.ndarray,
    p_rows: jnp.ndarray | None = None,
    *,
    mesh: Mesh,
    axis_name: str = "ensemble",
    **kwargs,
):
    """:func:`ensemble_solve_kernel` with members sharded over a mesh axis.

    ``y0_rows``/``p_rows`` are the usual ``(R, B)``/``(P, B)`` rows arrays
    with ``B`` divisible by the mesh axis size; each device runs the
    whole-solve kernel on its ``B / n_devices`` lane shard. Returns the
    ``(n_saves, rows, B)`` save buffer sharded along its member axis.
    All keyword arguments of the single-chip entry are forwarded.
    """
    y0_rows = jnp.asarray(y0_rows, jnp.float32)
    _, batch = y0_rows.shape
    _check_batch(batch, mesh, axis_name)
    if p_rows is None:
        p_rows = jnp.zeros((0, batch), jnp.float32)
    p_rows = jnp.asarray(p_rows, jnp.float32)

    def local_solve(y_loc, p_loc):
        return ensemble_solve_kernel(rhs, y_loc, p_loc, **kwargs)

    return jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name)),
        out_specs=P(None, None, axis_name),
    )(y0_rows, p_rows)


def ensemble_solve_kernel_adaptive_sharded(
    rhs: Callable,
    y0_rows: jnp.ndarray,
    p_rows: jnp.ndarray | None = None,
    *,
    mesh: Mesh,
    axis_name: str = "ensemble",
    **kwargs,
):
    """:func:`ensemble_solve_kernel_adaptive` sharded over a mesh axis.

    Returns ``(saves, stats)`` exactly like the single-chip entry; the
    per-lane-block ``stats`` arrays concatenate each device's blocks along
    the block axis (device-major order). For bit-identical results across
    mesh widths pass ``block_b`` dividing the per-device batch (module
    docstring: the lockstep dt chain is per block).
    """
    y0_rows = jnp.asarray(y0_rows, jnp.float32)
    _, batch = y0_rows.shape
    _check_batch(batch, mesh, axis_name)
    if p_rows is None:
        p_rows = jnp.zeros((0, batch), jnp.float32)
    p_rows = jnp.asarray(p_rows, jnp.float32)

    def local_solve(y_loc, p_loc):
        return ensemble_solve_kernel_adaptive(rhs, y_loc, p_loc, **kwargs)

    return jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name)),
        out_specs=(P(None, None, axis_name), P(axis_name)),
        # no collectives inside; the vma checker false-positives on the
        # lockstep controller's scalar (t, dt) carry, which starts
        # replicated and becomes shard-varying once it meets member data
        check_vma=False,
    )(y0_rows, p_rows)


def seip_ensemble_solve_sharded(
    y0,
    params,
    beta_scales,
    *,
    mesh: Mesh,
    axis_name: str = "ensemble",
    **kwargs,
):
    """:func:`~dynode_tpu.ops.seip_pallas.seip_ensemble_solve` over a mesh.

    ``beta_scales`` (``(B,)`` or ``(L, B)``) is sharded along its member
    axis; ``y0``/``params`` are compiled-in constants exactly as in the
    single-chip kernel (host values, not traced arrays). Per-device batch
    must satisfy the kernel's member-tile constraint (multiple of 1024).
    Returns member-last saves sharded along the member axis
    (``packed=True`` is not supported here: the packed member-tile
    bijection is per-device and would not concatenate to the global one).
    """
    from .seip_pallas import seip_ensemble_solve

    if kwargs.get("packed"):
        raise ValueError(
            "packed=True is per-device layout; use packed=False when "
            "sharding (or unpack per shard)"
        )
    beta_scales = jnp.asarray(beta_scales)
    batch = beta_scales.shape[-1]
    _check_batch(batch, mesh, axis_name)
    spec = P(*([None] * (beta_scales.ndim - 1)), axis_name)

    def local_solve(scales_loc):
        return seip_ensemble_solve(y0, params, scales_loc, **kwargs)

    # each saved compartment comes back (T, *shape, B) member-last; derive
    # the per-output P(None, ..., axis_name) specs from an abstract eval.
    # This traces the solve twice (eval_shape + shard_map) -- accepted:
    # it is a one-time setup cost per jitted configuration, and deriving
    # ranks structurally would have to mirror every save/packed variant
    # of the kernel's output contract
    shapes = jax.eval_shape(
        lambda s: local_solve(s),
        jax.ShapeDtypeStruct(beta_scales.shape, beta_scales.dtype),
    )
    out_specs = jax.tree.map(
        lambda sd: P(*([None] * (len(sd.shape) - 1)), axis_name), shapes
    )

    return jax.shard_map(
        local_solve, mesh=mesh, in_specs=(spec,), out_specs=out_specs,
        check_vma=False,
    )(beta_scales)


def seip_ensemble_solve_adaptive_sharded(
    y0,
    params,
    beta_scales,
    *,
    mesh: Mesh,
    axis_name: str = "ensemble",
    **kwargs,
):
    """Adaptive SEIP kernel over a mesh (lockstep BS3(2), error-controlled).

    Same contract as :func:`seip_ensemble_solve_sharded`; returns
    ``(outs, stats)`` like the single-chip entry, with the per-block
    ``stats`` arrays concatenated device-major along the block axis. The
    lockstep dt chain is per 1024-member block, which the device split
    preserves (per-device batch is a multiple of 1024), so results are
    bit-identical to the single-device kernel on TPU; the pure-lax
    fallback runs one global block per device (tolerance-level agreement).
    """
    from .seip_pallas import seip_ensemble_solve_adaptive

    if kwargs.get("packed"):
        raise ValueError(
            "packed=True is per-device layout; use packed=False when "
            "sharding (or unpack per shard)"
        )
    beta_scales = jnp.asarray(beta_scales)
    batch = beta_scales.shape[-1]
    _check_batch(batch, mesh, axis_name)
    spec = P(*([None] * (beta_scales.ndim - 1)), axis_name)

    def local_solve(scales_loc):
        return seip_ensemble_solve_adaptive(y0, params, scales_loc, **kwargs)

    outs_shapes, stats_shapes = jax.eval_shape(
        lambda s: local_solve(s),
        jax.ShapeDtypeStruct(beta_scales.shape, beta_scales.dtype),
    )
    out_specs = (
        jax.tree.map(
            lambda sd: P(*([None] * (len(sd.shape) - 1)), axis_name),
            outs_shapes,
        ),
        jax.tree.map(lambda sd: P(axis_name), stats_shapes),
    )

    return jax.shard_map(
        local_solve, mesh=mesh, in_specs=(spec,), out_specs=out_specs,
        check_vma=False,
    )(beta_scales)
