"""SEIP roofline probe: XLA cost analysis + measured wall -> achieved GB/s, GFLOP/s.

Compares the compiled program's own accounting (flops, bytes accessed) against
v5e peaks (819 GB/s HBM, ~197 bf16 / ~98 f32 MXU TFLOPs, VPU ~ a few TFLOPs)
to decide whether the constant-step SEIP ensemble is bandwidth- or
compute-bound, and what a whole-solve VMEM kernel could recover.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import time

import jax
import jax.numpy as jnp

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config,
    seip_initial_state,
    seip_ode,
    seip_odeparams,
)

DURATION = 200
DT = 0.5

config = seip_config(
    seasonal_vaccination=True,
    solver_params=SolverParams(constant_step_size=DT),
)
sp = config.parameters.solver_params
base = seip_odeparams(config)
y0 = seip_initial_state(config)


def _draws(n, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (n,), minval=0.9, maxval=1.1)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(jnp.stack([jnp.sum(x) for x in leaves if x.size])))


def batch_leading(draws):
    def one(scale):
        p = base.replace(beta=base.beta * scale)
        sol = simulate(seip_ode, DURATION, y0, p, sp, sub_save_indices=(3,))
        return sol.ys[3]
    return jax.vmap(one)(draws)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    state_floats = sum(int(jnp.asarray(c).size) for c in y0)
    print("state floats/member:", state_floats)
    for n in (1024, 4096):
        fn = jax.jit(batch_leading)
        d = _draws(n, 0)
        lowered = fn.lower(d)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops", float("nan"))
            ba = ca.get("bytes accessed", float("nan"))
            print(f"n={n}: flops={flops:.3e}  bytes_accessed={ba:.3e}")
            for k, v in sorted(ca.items()):
                if "bytes" in k and isinstance(v, float) and v > 1e6:
                    print(f"    {k}: {v:.3e}")
        except Exception as e:
            print("cost_analysis failed:", e)
            flops = ba = float("nan")
        _sync(fn(d))
        best = float("inf")
        for rep in range(3):
            dd = _draws(n, rep + 1)
            t0 = time.perf_counter()
            _sync(fn(dd))
            best = min(best, time.perf_counter() - t0)
        tps = n / best
        print(
            f"n={n}: wall={best:.3f}s  {tps:,.0f} traj/s  "
            f"achieved_bw={ba / best / 1e9:,.1f} GB/s  "
            f"achieved_flops={flops / best / 1e12:.3f} TFLOP/s",
            flush=True,
        )
        # perfect-fusion lower bound: read+write state once per stage eval
        steps = int(DURATION / DT)
        stages = 6  # Tsit5 FSAL effective evals/step
        min_bytes = 2.0 * state_floats * 4 * stages * steps * n
        print(
            f"n={n}: per-member bytes (XLA) = {ba / n / 1e6:.2f} MB, "
            f"perfect-fusion bound = {min_bytes / n / 1e6:.2f} MB, "
            f"VMEM-resident bound ~= {201 * 128 * 4 / 1e6 * 1:.3f} MB (saves only)",
            flush=True,
        )
