"""Does bf16 saving extend the SEIP kernel's width ceiling?

The kernel's width bound is the HBM OUTPUT buffer (CLAUDE.md): f32
C-only daily saves OOM just past B=32768, and all-4 saves OOM at 16384.
``save_dtype=bfloat16`` halves the buffer; if the bound is really the
output (not VMEM working set), bf16 should unlock the next doubling and
keep the traj/s curve climbing. Measure (min-of-2, fetch-synced, fresh
scales per rep):

  f32  C-only: 16384, 32768          (round-3 reference points)
  bf16 C-only: 32768, 65536          (the doubling f32 cannot reach)
  bf16 all-4:  16384, 32768          (vs f32 all-4 OOM at 16384)

Measured (v5e-1, 2026-08-17):

  f32  C-only  B=16384:  119,436 traj/s
  f32  C-only  B=32768:  133,001 traj/s
  bf16 C-only  B=32768:  169,067 traj/s   <- beats f32 at the SAME width:
  bf16 C-only  B=65536:  172,242 traj/s      the save DMA traffic itself
  bf16 all-4   B=16384:   99,490 traj/s      was a measurable cost
  bf16 all-4   B=32768:  OOM (ResourceExhausted)

So bf16 saves (1) beat f32 saves at equal width (+27%, only the DMA
volume changed), (2) unlock B=65536 C-only and B=16384 all-4 (both OOM
in f32), and (3) push the width curve's plateau to ~170k traj/s. The
accuracy check runs FIRST below: a failed (OOM) kernel launch can leave
the client unable to allocate afterwards.
"""

import _bootstrap  # noqa: F401

import time

import jax
import jax.numpy as jnp
import numpy as np

from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config,
    seip_initial_state,
    seip_odeparams,
)
from dynode_tpu.ops.seip_pallas import seip_ensemble_solve

cfg = seip_config(
    seasonal_vaccination=True,
    solver_params=SolverParams(constant_step_size=0.5),
)
p = seip_odeparams(cfg)
y0 = seip_initial_state(cfg)


def scales(n, seed):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (n,), minval=0.85, maxval=1.2
    )


def run(b, save, dtype, label):
    try:
        def f(seed):
            return seip_ensemble_solve(
                y0, p, scales(b, seed), duration=200, dt=0.5, save=save,
                save_dtype=dtype,
            )[0]

        out = f(0)
        # fetch-sync on a value derived from the result (timing rule)
        float(jnp.sum(out[-1].astype(jnp.float32)))
        best = float("inf")
        for rep in (1, 2):
            t0 = time.perf_counter()
            out = f(rep)
            float(jnp.sum(out[-1].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:<24} B={b:>6}: {b / best:>10,.0f} traj/s "
              f"({best:.2f}s)")
        return b / best
    except Exception as e:
        print(f"{label:<24} B={b:>6}: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})")
        return 0.0


print("device:", jax.devices()[0].platform)

# accuracy spot-check FIRST (an OOM attempt below can poison allocs)
(k32,) = seip_ensemble_solve(y0, p, scales(4096, 9), duration=50, save=(3,))
(k16,) = seip_ensemble_solve(
    y0, p, scales(4096, 9), duration=50, save=(3,), save_dtype=jnp.bfloat16
)
a32 = np.asarray(jax.device_get(k32), np.float64)
a16 = np.asarray(jax.device_get(k16.astype(jnp.float32)), np.float64)
rel = np.max(np.abs(a16 - a32) / np.maximum(np.abs(a32), 1.0))
print(f"bf16-vs-f32 save rel err @4096: {rel:.2e} (bf16 grid ~ 4e-3)")

run(16384, (3,), jnp.float32, "f32 C-only")
run(32768, (3,), jnp.float32, "f32 C-only")
run(32768, (3,), jnp.bfloat16, "bf16 C-only")
run(65536, (3,), jnp.bfloat16, "bf16 C-only")
run(16384, (0, 1, 2, 3), jnp.bfloat16, "bf16 all-4")
run(32768, (0, 1, 2, 3), jnp.bfloat16, "bf16 all-4")
