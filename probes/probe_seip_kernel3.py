"""Arbitrate kernel-vs-XLA discrepancy with a CPU f64 oracle (subprocess).

Hypothesis: the XLA path's einsum/matmul contractions default to bf16 on the
TPU MXU, so the REFERENCE is the imprecise one and the kernel (exact f32
VPU) is closer to truth.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)
import os
import pickle
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

if os.environ.get("ORACLE"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from dynode_tpu.config import SolverParams
    from dynode_tpu.models.seip import seip_config, seip_initial_state, seip_odeparams
    from dynode_tpu.ops.seip_pallas import seip_solve_reference

    config = seip_config(seasonal_vaccination=True,
                         solver_params=SolverParams(constant_step_size=0.5))
    p = seip_odeparams(config)
    y0 = seip_initial_state(config)
    scales = jnp.asarray(np.linspace(0.9, 1.1, 8, dtype=np.float32))
    outs = seip_solve_reference(y0, p, scales, duration=10, dt=0.5)
    with open("/tmp/seip_oracle.pkl", "wb") as f:
        pickle.dump([np.asarray(o, np.float64) for o in outs], f)
    print("oracle written")
    sys.exit(0)

# --- TPU side ---------------------------------------------------------------
env = dict(os.environ)
env["ORACLE"] = "1"
env["JAX_PLATFORMS"] = "cpu"
subprocess.run([sys.executable, os.path.abspath(__file__)], env=env, check=True, cwd=HERE)

import jax
import jax.numpy as jnp

from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import seip_config, seip_initial_state, seip_odeparams
from dynode_tpu.ops.seip_pallas import seip_ensemble_solve, seip_solve_reference

config = seip_config(seasonal_vaccination=True,
                     solver_params=SolverParams(constant_step_size=0.5))
p = seip_odeparams(config)
y0 = seip_initial_state(config)
scales8 = jnp.asarray(np.linspace(0.9, 1.1, 8, dtype=np.float32))
# kernel needs B % 1024 == 0: tile the 8 scales 128x, compare first 8 lanes
scales = jnp.tile(scales8, 128)

kern = jax.device_get(seip_ensemble_solve(y0, p, scales, duration=10, dt=0.5))
ref32 = jax.device_get(seip_solve_reference(y0, p, scales8, duration=10, dt=0.5))
with open("/tmp/seip_oracle.pkl", "rb") as f:
    oracle = pickle.load(f)

for name, k_, r_, o_ in zip("SEIC", kern, ref32, oracle):
    k_ = np.asarray(k_, np.float64)[..., :8]
    r_ = np.asarray(r_, np.float64)
    o_ = np.asarray(o_)
    denom = np.maximum(np.abs(o_), 1.0)
    print(f"{name}: kernel-vs-f64 {np.max(np.abs(k_-o_)/denom):.3e}   "
          f"xla_f32-vs-f64 {np.max(np.abs(r_-o_)/denom):.3e}")
