
import _bootstrap  # noqa: F401  (repo-root sys.path shim)
import math, time
import jax
import jax.numpy as jnp
from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.multistrain import (
    multistrain_config, multistrain_ensemble_params, multistrain_ensemble_state,
    multistrain_initial_state, multistrain_ode_ensemble, multistrain_odeparams,
)

DURATION = 200.0
cfg = multistrain_config(solver_params=SolverParams(
    step_budget=448, ode_solver_rel_tolerance=1e-5, ode_solver_abs_tolerance=1e-3,
    steps_per_save=8))
sp = cfg.parameters.solver_params
base = multistrain_odeparams(cfg)
y0 = multistrain_initial_state(cfg)

def _draws(n, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n,), minval=0.8, maxval=1.25)

def _sync(x):
    return float(jnp.sum(x))

def run(draws):
    n = draws.shape[0]
    pb = multistrain_ensemble_params(base, draws)
    y0b = multistrain_ensemble_state(y0, n)
    sol = simulate(multistrain_ode_ensemble, DURATION, y0b, pb, sp)
    return sol.ys[-1][-1], sol.result, sol.stats["num_steps"]

fn = jax.jit(run)
for n in (79872, 159744):
    y, res, steps = jax.device_get(fn(_draws(n, 0)))
    total = float(y.sum())
    print(f"n={n}: result={int(res)} steps={int(steps)} finite={math.isfinite(total)}", flush=True)
    best = float("inf")
    for rep in range(3):
        d = _draws(n, rep + 1)
        t0 = time.perf_counter()
        _sync(fn(d)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"n={n}: lane adaptive K=8 {n/best:,.0f} traj/s", flush=True)
