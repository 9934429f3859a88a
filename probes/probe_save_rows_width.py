"""Does save_rows widen/speed the generic kernel's max-width regime?

The (n_saves, R, B) save buffer bounds the generic kernel's widest
ensemble (B=320k OOMs with all 26 multistrain rows even in bf16).
``save_rows`` saves only the observable rows -- a production fit needs
just the A*K cumulative-incidence rows (6 of 26) -- cutting the buffer
~4.3x. Measure multistrain throughput at/beyond the previous max width
with full vs incidence-only saves.

Usage: python probes/probe_save_rows_width.py [B ...] [--variant NAME]  (TPU)

Round-4 finding: run ONE (B, variant) per process when probing the width
wall -- a genuinely-OOM launch (full-f32 at 491520 is a 12.6 GB buffer)
poisons later allocations in the same process, which is how "every
variant OOMs at 491520" was mis-recorded; fresh-process c-only bf16 at
491520 fits and runs (see CLAUDE.md).
"""

import sys
import time

import _bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dynode_tpu.ops import ensemble_solve_kernel
from dynode_tpu.ops import multistrain_pallas as mp
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_odeparams,
)
from dynode_tpu.config import SolverParams

DURATION, DT = 200.0, 0.5
A, K = mp.A_DIM, mp.K_DIM
D = mp._d_rows(A, K)
C_ROWS = tuple(range(D - A * K, D))  # cumulative-incidence rows (last A*K)


def _sync(out):
    return float(jnp.sum(out[-1].astype(jnp.float32)))


def main():
    cfg = multistrain_config(solver_params=SolverParams(constant_step_size=DT))
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    contact = tuple(
        tuple(float(x) for x in row) for row in np.asarray(base.contact_matrix)
    )

    def rhs(y, p, t):
        beta = [p[k] for k in range(K)]
        sigma = [p[K + k] for k in range(K)]
        gamma = [p[2 * K + k] for k in range(K)]
        omega = [p[3 * K + k] for k in range(K)]
        return mp._rhs_rows(y, contact, beta, sigma, gamma, omega, A, K)

    def solve(B, seed, save_rows, save_dtype):
        key = jax.random.PRNGKey(seed)
        scales = jax.random.uniform(key, (B, K), minval=0.8, maxval=1.2)
        y0r = mp.pack_state(tuple(jnp.asarray(a) for a in y0), B)
        pr = mp.pack_params(
            base.beta[None, :] * scales, base.sigma, base.gamma, base.omega, B
        )
        return ensemble_solve_kernel(
            rhs, y0r, pr, duration=DURATION, dt=DT,
            save_rows=save_rows, save_dtype=save_dtype,
        )

    solve_j = jax.jit(solve, static_argnames=("B", "save_rows", "save_dtype"))

    variants = (
        ("full-f32", None, jnp.float32),
        ("full-bf16", None, jnp.bfloat16),
        ("c-only-bf16", C_ROWS, jnp.bfloat16),
    )
    argv = sys.argv[1:]
    only = None
    if "--variant" in argv:
        i = argv.index("--variant")
        only = argv[i + 1]
        del argv[i : i + 2]
    widths = tuple(int(a) for a in argv) or (163840, 245760, 327680, 491520)
    for B in widths:
        for label, rows, dt_ in variants:
            if only is not None and label != only:
                continue
            try:
                _sync(solve_j(B, 0, rows, dt_))  # compile + warm
                walls = []
                for rep in (1, 2, 3):
                    t0 = time.perf_counter()
                    _sync(solve_j(B, rep, rows, dt_))
                    walls.append(time.perf_counter() - t0)
                w = float(np.median(walls))
                print(
                    f"[save_rows] B={B} {label}: {B / w:,.0f} traj/s "
                    f"({w*1e3:.0f} ms)",
                    file=sys.stderr,
                )
            except Exception as e:
                print(
                    f"[save_rows] B={B} {label}: FAILED "
                    f"({type(e).__name__}: {str(e)[:140]})",
                    file=sys.stderr,
                )


if __name__ == "__main__":
    main()
