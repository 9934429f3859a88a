"""Diagnose kernel-vs-reference divergence: per-day error growth, B=1024."""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import seip_config, seip_initial_state, seip_odeparams
from dynode_tpu.ops.seip_pallas import seip_ensemble_solve, seip_solve_reference

DUR, DT = 50, 0.5
config = seip_config(seasonal_vaccination=True, solver_params=SolverParams(constant_step_size=DT))
p = seip_odeparams(config)
y0 = seip_initial_state(config)

B = 1024
scales = jax.random.uniform(jax.random.PRNGKey(0), (B,), minval=0.9, maxval=1.1)

outs = jax.device_get(seip_ensemble_solve(y0, p, scales, duration=DUR, dt=DT))
refs = jax.device_get(seip_solve_reference(y0, p, scales, duration=DUR, dt=DT))

C_k, C_r = np.asarray(outs[3]), np.asarray(refs[3])
for d in (1, 2, 5, 10, 20, 30, 40, 50):
    denom = np.maximum(np.abs(C_r[d]), 1.0)
    print(f"day {d:3d}: C max rel diff {np.max(np.abs(C_k[d]-C_r[d])/denom):.3e}")
# which member/compartment is worst at day 5
denom = np.maximum(np.abs(C_r[5]), 1.0)
rd = np.abs(C_k[5]-C_r[5])/denom
idx = np.unravel_index(np.argmax(rd), rd.shape)
print("worst idx day5 (a,j,k,l,member):", idx, "kernel", C_k[5][idx], "ref", C_r[5][idx])
