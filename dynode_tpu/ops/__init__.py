"""Pallas TPU kernels for the hot compute paths.

The flagship kernel integrates an entire multi-strain SEIRS ensemble *inside
one Pallas program*: the packed state stays resident in VMEM across every RK
stage of every time step (zero HBM round-trips on the hot loop), with daily
saves DMA'd out asynchronously. The ensemble axis rides the TPU lane
dimension so all compartment algebra is dense VPU work.

``generic_pallas`` (round 4) generalizes that design to ANY small-state
model: supply the RHS in the lane-major rows idiom and get the same
whole-solve-in-VMEM execution without writing Pallas.
"""

from .generic_pallas import (
    ensemble_solve_kernel,
    ensemble_solve_kernel_adaptive,
    ensemble_solve_kernel_adaptive_reference,
    ensemble_solve_kernel_reference,
    pack_rows,
    unpack_rows,
)
from .multistrain_pallas import (
    ensemble_solve_reference,
    ensemble_solve_tsit5,
    pack_params,
    pack_state,
    pick_block_b,
    unpack_saves,
)
from .sharded import (
    ensemble_solve_kernel_adaptive_sharded,
    ensemble_solve_kernel_sharded,
    seip_ensemble_solve_adaptive_sharded,
    seip_ensemble_solve_sharded,
)

__all__ = [
    "ensemble_solve_kernel_sharded",
    "ensemble_solve_kernel_adaptive_sharded",
    "seip_ensemble_solve_sharded",
    "seip_ensemble_solve_adaptive_sharded",
    "ensemble_solve_tsit5",
    "ensemble_solve_reference",
    "ensemble_solve_kernel",
    "ensemble_solve_kernel_adaptive",
    "ensemble_solve_kernel_adaptive_reference",
    "ensemble_solve_kernel_reference",
    "pack_rows",
    "unpack_rows",
    "pack_state",
    "pack_params",
    "pick_block_b",
    "unpack_saves",
]
