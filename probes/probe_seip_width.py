"""SEIP kernel width sweep + precision-cost attribution.

1. Is the round-3 XLA slowdown (19.9k -> 14.0k at B=4096) the
   Precision.HIGHEST fix or tunnel weather? Time batch-leading with
   DEFAULT vs HIGHEST contractions.
2. Where does the Pallas kernel saturate? Sweep 4096 -> 16384 members.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import time

import jax
import jax.numpy as jnp
import numpy as np

import dynode_tpu.models.seip as seip_mod
from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import seip_config, seip_initial_state, seip_odeparams
from dynode_tpu.ops.seip_pallas import seip_ensemble_solve

DURATION = 200
cfg = seip_config(
    seasonal_vaccination=True, solver_params=SolverParams(constant_step_size=0.5)
)
base = seip_odeparams(cfg)
y0 = seip_initial_state(cfg)


def _sync(out):
    total = float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    assert np.isfinite(total)
    return total


def draws(n, seed):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (n,), minval=0.85, maxval=1.2
    )


def time_fn(fn, n, reps=3):
    _sync(fn(draws(n, 0)))
    best = float("inf")
    for r in range(reps):
        d = draws(n, r + 1)
        t0 = time.perf_counter()
        _sync(fn(d))
        best = min(best, time.perf_counter() - t0)
    return n / best


# --- 1: precision attribution at B=4096 (batch-leading) ---------------------
def make_lead():
    def solve_one(scale):
        p = base.replace(beta=base.beta * scale)
        sol = simulate(
            seip_mod.seip_ode, DURATION, y0, p, cfg.parameters.solver_params,
            sub_save_indices=(3,),
        )
        return sol.ys[3]

    return jax.jit(jax.vmap(solve_one))


for prec_name, prec in (
    ("HIGHEST", jax.lax.Precision.HIGHEST),
    ("DEFAULT", jax.lax.Precision.DEFAULT),
):
    try:
        seip_mod._PREC = prec
        tps = time_fn(make_lead(), 4096)
        print(f"batch-leading B=4096 precision={prec_name}: {tps:,.0f} traj/s",
              flush=True)
    except Exception as e:
        print(f"batch-leading precision={prec_name} FAILED: {type(e).__name__}",
              flush=True)
seip_mod._PREC = jax.lax.Precision.HIGHEST

# --- 2: kernel width sweep (C-only saves: output buffer bounds width) -------
for n in (4096, 8192, 16384, 32768):
    def run_kernel(d):
        return seip_ensemble_solve(
            y0, base, d, duration=DURATION, dt=0.5, save=(3,)
        )[0]

    try:
        tps = time_fn(run_kernel, n)
        print(f"pallas kernel B={n}: {tps:,.0f} traj/s", flush=True)
    except Exception as e:
        print(f"pallas kernel B={n} FAILED: {type(e).__name__}: {e}"[:200],
              flush=True)
