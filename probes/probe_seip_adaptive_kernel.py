"""Probe: adaptive (lockstep-dt) SEIP VMEM kernel — accuracy + throughput.

Run on the real TPU (no env overrides). Compares the adaptive kernel
against the constant-step kernel at a tight dt (on-device reductions only;
the tunnel fetches scalars), then sweeps width for throughput.

Usage: python probes/probe_seip_adaptive_kernel.py [quick]
"""

import sys
import time

import _bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config,
    seip_initial_state,
    seip_odeparams,
)
from dynode_tpu.ops.seip_pallas import (
    seip_ensemble_solve,
    seip_ensemble_solve_adaptive,
)

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"


def fetch_scalar(x):
    return float(jax.device_get(x))


def main():
    print("backend:", jax.default_backend())
    cfg = seip_config(
        seasonal_vaccination=True,
        solver_params=SolverParams(constant_step_size=0.5),
    )
    p = seip_odeparams(cfg)
    y0 = seip_initial_state(cfg)
    duration = 50 if QUICK else 200

    # ---- accuracy: adaptive vs tight-dt constant kernel at B=1024 -------
    key = jax.random.PRNGKey(0)
    scales = 1.0 + 0.1 * jax.random.normal(key, (1024,), jnp.float32)
    t0 = time.perf_counter()
    outs_a, stats = seip_ensemble_solve_adaptive(
        y0, p, scales, duration=duration, rtol=1e-4, atol=1e-3,
        save=(3,), packed=True,
    )
    bad = int(np.asarray(stats["exhausted_intervals"]).sum())
    na = np.asarray(stats["n_accepted"])
    nr = np.asarray(stats["n_rejected"])
    print(
        f"adaptive compile+run: {time.perf_counter()-t0:.1f}s  "
        f"exhausted={bad} accepted={na} rejected={nr}"
    )
    outs_c = seip_ensemble_solve(
        y0, p, scales, duration=duration, dt=0.05, save=(3,), packed=True,
    )
    # on-device relative error; fetch one scalar
    num = jnp.max(jnp.abs(outs_a[0] - outs_c[0]))
    den = jnp.max(jnp.abs(outs_c[0]))
    rel = fetch_scalar(num) / fetch_scalar(den)
    print(f"max rel err vs const dt=0.05: {rel:.3e}")
    assert bad == 0, "budget exhausted — raise steps_per_save"
    assert rel < 5e-3, rel

    if QUICK:
        return

    # ---- throughput sweep ------------------------------------------------
    def timed(fn, B, label):
        key = jax.random.PRNGKey(1)
        sc = 1.0 + 0.1 * jax.random.normal(key, (B,), jnp.float32)
        t0 = time.perf_counter()
        out = fn(sc)
        s = fetch_scalar(jnp.sum(out[-1], dtype=jnp.float32))
        cold = time.perf_counter() - t0
        assert np.isfinite(s), label
        best = float("inf")
        for rep in range(3):
            k2 = jax.random.PRNGKey(rep + 2)
            sc = 1.0 + 0.1 * jax.random.normal(k2, (B,), jnp.float32)
            t0 = time.perf_counter()
            out = fn(sc)
            s = fetch_scalar(jnp.sum(out[-1], dtype=jnp.float32))
            best = min(best, time.perf_counter() - t0)
        print(
            f"{label:42s} B={B:6d} cold={cold:6.1f}s best={best:6.3f}s "
            f"-> {B/best:10.0f} traj/s"
        )
        return B / best

    def adaptive_c(sc):
        outs, _ = seip_ensemble_solve_adaptive(
            y0, p, sc, duration=200, rtol=1e-4, atol=1e-3, save=(3,),
            packed=True,
        )
        return outs[0]

    def adaptive_full4_bf16(sc):
        outs, _ = seip_ensemble_solve_adaptive(
            y0, p, sc, duration=200, rtol=1e-4, atol=1e-3,
            save_dtype=jnp.bfloat16, packed=True,
        )
        return outs[3]

    def const_c(sc):
        outs = seip_ensemble_solve(
            y0, p, sc, duration=200, dt=0.5, save=(3,), packed=True,
        )
        return outs[0]

    for B in (4096, 16384, 32768):
        timed(const_c, B, "const dt=0.5 C-only f32")
        timed(adaptive_c, B, "adaptive rtol=1e-4 C-only f32")
    timed(adaptive_full4_bf16, 32768, "adaptive rtol=1e-4 full-4 bf16")


if __name__ == "__main__":
    main()
