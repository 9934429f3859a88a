"""Validate the round-4 pipelined save DMA + full-4-compartment saves.

1. equivalence: pipelined-kernel saves (all 4 compartments, every save
   point) vs the XLA batch-leading Tsit5 solve at B=1024,
2. width: full-4 bf16 daily saves at B=32768 with packed=True output
   (7.9 GiB -> 3.93 GiB buffer, no unpack copy), timed vs C-only.
"""
import sys, time
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config, seip_initial_state, seip_ode, seip_odeparams,
)
from dynode_tpu.ops.seip_pallas import seip_ensemble_solve, unpack_members

print("backend:", jax.default_backend(), flush=True)

cfg = seip_config(
    seasonal_vaccination=True,
    solver_params=SolverParams(constant_step_size=0.5),
)
base = seip_odeparams(cfg)
y0 = seip_initial_state(cfg)


def scales(n, seed):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (n,), minval=0.85, maxval=1.2
    )


def solve_one(scale):
    p = base.replace(beta=base.beta * scale)
    sol = simulate(seip_ode, 200, y0, p, cfg.parameters.solver_params)
    return sol.ys


lead = jax.jit(jax.vmap(solve_one, out_axes=tuple([-1] * 4)))

# ---- 1: full-4 f32 equivalence at B=1024 (EVERY save point, EVERY comp)
t0 = time.perf_counter()
k = seip_ensemble_solve(y0, base, scales(1024, 0), duration=200, dt=0.5)
k = [np.asarray(jax.device_get(c), np.float64) for c in k]
print(f"kernel full-4 B=1024: {time.perf_counter()-t0:.1f}s", flush=True)
x = lead(scales(1024, 0))
x = [np.asarray(jax.device_get(c), np.float64) for c in x]
for i, (kc, xc) in enumerate(zip(k, x)):
    d = float(np.max(np.abs(kc - xc) / np.maximum(np.abs(xc), 1.0)))
    print(f"  comp {i}: max rel diff vs XLA Tsit5 = {d:.2e}", flush=True)
    assert d < 2e-2, (i, d)

# also check a mid-trajectory save point (pipelining bug would corrupt
# early slots, not just the final one) and t=0
for slot in (0, 1, 97):
    d = max(
        float(np.max(np.abs(kc[slot] - xc[slot]) / np.maximum(np.abs(xc[slot]), 1.0)))
        for kc, xc in zip(k, x)
    )
    print(f"  slot {slot}: max rel diff {d:.2e}", flush=True)
    assert d < 2e-2
del k, x

# ---- 2: timing C-only vs full-4 at B=32768 bf16 packed ------------------


def _sync(out):
    # fused f32-accumulating reduce: no materialized upcast copy (an eager
    # .astype(f32) of a 7.9 GiB bf16 buffer is itself an OOM)
    return float(sum(jnp.sum(c, dtype=jnp.float32) for c in out))


def timed(tag, fn, n, reps=3):
    s = _sync(fn(1))
    assert np.isfinite(s), (tag, s)
    walls = []
    for r in range(reps):
        t0 = time.perf_counter()
        s = _sync(fn(2 + r))
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    print(f"{tag}: {n / w:,.0f} traj/s (median {w:.3f}s of {reps}, "
          f"spread {(max(walls)-min(walls))/w:.2f})", flush=True)
    return n / w


B = 32768
c_tps = timed(
    "C-only bf16 @32k", lambda s: seip_ensemble_solve(
        y0, base, scales(B, s), duration=200, dt=0.5, save=(3,),
        save_dtype=jnp.bfloat16, packed=True), B,
)
f4_tps = timed(
    "full-4 bf16 @32k packed", lambda s: seip_ensemble_solve(
        y0, base, scales(B, s), duration=200, dt=0.5,
        save_dtype=jnp.bfloat16, packed=True), B,
)
print(f"full-4 / C-only throughput ratio: {f4_tps / c_tps:.3f}", flush=True)

# spot-check packed full-4 values at width against the reference member 0
k4 = seip_ensemble_solve(
    y0, base, scales(B, 2 + 2), duration=200, dt=0.5,
    save_dtype=jnp.bfloat16, packed=True,
)
c_unpacked = unpack_members(k4[3][-1])  # final C save, (A,J,K,L,B)
one = lead(scales(4096, 99)[:4])  # small sanity solve
print("final-C ensemble mean (packed path):",
      float(jnp.mean(c_unpacked.astype(jnp.float32))), flush=True)
