"""Multistrain VMEM-kernel block-size x width sweep.

The whole-solve Tsit5 kernel defaults to block_b=256 (32, 256) tiles --
4 sublane x 2 lane tiles per VPU op, likely loop-overhead dominated.
Pallas grid programs run sequentially on the single v5e TensorCore, so
throughput is flat in ensemble width at fixed block_b; the lever is the
block size. This sweep asks whether bigger blocks close the gap to the
XLA batch-leading path at saturating width (~500k traj/s at 80k).

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
