"""Multistrain VMEM-kernel block-size x width sweep.

The whole-solve Tsit5 kernel defaults to block_b=256 (32, 256) tiles --
4 sublane x 2 lane tiles per VPU op, likely loop-overhead dominated.
Pallas grid programs run sequentially on the single v5e TensorCore, so
throughput is flat in ensemble width at fixed block_b; the lever is the
block size. This sweep asks whether bigger blocks close the gap to the
XLA batch-leading path at saturating width (~500k traj/s at 80k).

Measured (v5e tunnel, 2026-08-18):
  B=9984:  180k @256, 153k @4992, 212k @9984 (one whole-array block)
  B=79872: 657k @256, 1,189k @1024, 1,193k @4992, 1,127k @9984,
           1,200-1,300k @2048 (follow-up runs)
  B=81920: 1,239k @2048 > 1,130k @4096
  B=163840 (interleaved, quiet window): 1,866k @2048 == 1,868k @4096
  B=327680: RESOURCE_EXHAUSTED (the (T, D, B) f32 save buffer)
Conclusions now productized: ensemble_solve_tsit5(block_b=None) auto-picks
via pick_block_b (2048 preferred), and bench.py carries both an
XLA-comparable 79872-wide row and a kernel-saturating 163840 row.

Usage: python probes/probe_multistrain_block_sweep.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from dynode_tpu.ops.multistrain_pallas import (  # noqa: E402
    ensemble_solve_tsit5,
    unpack_saves,
)

A, K = 2, 3
DUR, DT = 200.0, 0.5


def make_inputs(batch, seed):
    key = jax.random.PRNGKey(seed)
    beta = jax.random.uniform(key, (batch, K), minval=0.2, maxval=0.5)
    sigma = jnp.full((K,), 0.25)
    gamma = jnp.full((K,), 0.14)
    omega = jnp.full((K,), 0.008)
    contact = np.array([[0.7, 0.3], [0.4, 0.6]])
    s0 = jnp.full((A,), 0.7 / A)
    e0 = jnp.full((A, K), 0.1 / (A * K))
    i0 = jnp.full((A, K), 0.1 / (A * K))
    r0 = jnp.full((A, K), 0.1 / (A * K))
    c0 = jnp.zeros((A, K))
    return (s0, e0, i0, r0, c0), beta, sigma, gamma, omega, contact


def run(batch, block_b, seed):
    y0, beta, sigma, gamma, omega, contact = make_inputs(batch, seed)
    out = ensemble_solve_tsit5(
        y0, beta, sigma, gamma, omega, contact,
        batch=batch, duration=DUR, dt=DT, block_b=block_b,
    )
    return out


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    for batch in (9984, 79872):
        for block_b in (256, 1024, 2496, 4992, 9984):
            if batch % block_b:
                continue
            try:
                _ = jax.block_until_ready(run(batch, block_b, 0))  # compile
                walls = []
                for rep in (1, 2, 3):
                    t0 = time.perf_counter()
                    out = run(batch, block_b, rep)
                    # host-fetch sync (tunnel block_until_ready can lie)
                    float(jnp.sum(out[-1]))
                    walls.append(time.perf_counter() - t0)
                w = sorted(walls)[1]
                print(
                    f"batch={batch:6d} block_b={block_b:5d}: "
                    f"{batch / w:10,.0f} traj/s (median of 3, {w:.3f}s)"
                )
            except Exception as e:
                print(f"batch={batch} block_b={block_b}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
