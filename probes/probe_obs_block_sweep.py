"""Round-5 probe: does the obs-saves row prefer wider lane blocks?

Hypothesis: with only 8 save rows (vs 26) the VMEM working set shrinks,
possibly moving the block_b optimum past 2048. Measured at B=655360
(bf16 padded obs saves, fused pack+solve, fetch-synced, median of 3):

    block_b=2048: 4,875,596 traj/s
    block_b=4096: 4,735,492 traj/s  (-3%)
    block_b=8192: 4,086,454 traj/s  (-16%)

NO: 2048 stays optimal (pick_block_b unchanged). The block_b knee is set
by the VPU's appetite for the per-step working set of the *solve* state
(26 rows live regardless of what is saved), not by the save staging tile.
Tunnel note: session measured ~12% below the same row's earlier 5.53M
(run-to-run tunnel variance, both fetch-synced).
"""

import statistics
import time

import jax
import jax.numpy as jnp

import dynode_tpu
import dynode_tpu.ops.multistrain_pallas as mp
from dynode_tpu.config import SolverParams
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_odeparams,
)
from dynode_tpu.ops import ensemble_solve_kernel

N = 655360


def main():
    """Run the sweep (TPU; one process at a time on the tunnel)."""
    dynode_tpu.enable_compilation_cache()
    cfg = multistrain_config(solver_params=SolverParams(step_budget=448))
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    A, K = mp.A_DIM, mp.K_DIM
    D = mp._d_rows(A, K)
    rows_sel = tuple(range(D - A * K, D))
    contact = tuple(
        tuple(float(v) for v in row)
        for row in jnp.asarray(base.contact_matrix).tolist()
    )

    def rhs(y, p, t):
        return mp._rhs_rows(
            y, contact, p[:K], p[K:2 * K], p[2 * K:3 * K], p[3 * K:4 * K],
            A, K,
        )

    yp = mp.pack_state(y0, N)

    def draws(seed):
        return jax.random.uniform(
            jax.random.PRNGKey(seed), (N,), minval=0.8, maxval=1.25
        )

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    for bb in (2048, 4096, 8192):
        @jax.jit
        def fused(ypk, scales, bb=bb):
            beta = base.beta[None, :] * scales[:, None]
            pp = mp.pack_params(beta, base.sigma, base.gamma, base.omega, N)
            return ensemble_solve_kernel(
                rhs, ypk, pp, duration=200.0, dt=0.5, save_rows=rows_sel,
                save_dtype=jnp.bfloat16, padded_rows=True, block_b=bb,
            )

        sync(fused(yp, draws(0)))
        walls = []
        for r in range(3):
            t0 = time.perf_counter()
            sync(fused(yp, draws(100 + r)))
            walls.append(time.perf_counter() - t0)
        print(f"block_b={bb}: {N / statistics.median(walls):,.0f} traj/s")


if __name__ == "__main__":
    main()
