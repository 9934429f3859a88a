
import _bootstrap  # noqa: F401  (repo-root sys.path shim)
import math, time
import jax
import jax.numpy as jnp
import numpy as np
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import seip_config, seip_initial_state, seip_odeparams
from dynode_tpu.ops.seip_pallas import seip_ensemble_solve, seip_solve_reference

DUR, DT = 50, 0.5   # short for the first correctness check
config = seip_config(seasonal_vaccination=True, solver_params=SolverParams(constant_step_size=DT))
p = seip_odeparams(config)
y0 = seip_initial_state(config)

B = 1024
scales = jax.random.uniform(jax.random.PRNGKey(0), (B,), minval=0.9, maxval=1.1)

print("running kernel...", flush=True)
t0 = time.perf_counter()
outs = seip_ensemble_solve(y0, p, scales, duration=DUR, dt=DT)
outs = jax.device_get(outs)
print(f"kernel compile+run {time.perf_counter()-t0:.1f}s", flush=True)

print("running reference (same RK4, vmap)...", flush=True)
refs = jax.device_get(seip_solve_reference(y0, p, scales, duration=DUR, dt=DT))
for name, a, b in zip("SEIC", outs, refs):
    a, b = np.asarray(a), np.asarray(b)
    denom = np.maximum(np.abs(b), 1.0)
    bad = not np.isfinite(a).all()
    print(f"{name}: max rel diff {np.max(np.abs(a-b)/denom):.2e}  nonfinite={bad}", flush=True)
