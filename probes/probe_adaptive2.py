
import _bootstrap  # noqa: F401  (repo-root sys.path shim)
import time
import jax
import jax.numpy as jnp
from dynode_tpu.config import SolverParams
from dynode_tpu.models.multistrain import (
    multistrain_config, multistrain_ensemble_params, multistrain_ensemble_state,
    multistrain_initial_state, multistrain_ode, multistrain_ode_ensemble,
    multistrain_odeparams,
)
from dynode_tpu.ode import SaveAt, PIDController, ClipStepSizeController, diffeqsolve

DURATION = 200.0
cfg = multistrain_config(solver_params=SolverParams(
    step_budget=448, ode_solver_rel_tolerance=1e-5, ode_solver_abs_tolerance=1e-3))
sp = cfg.parameters.solver_params
base = multistrain_odeparams(cfg)
y0 = multistrain_initial_state(cfg)
daily = jnp.linspace(0.0, DURATION, 201)

def _draws(n, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n,), minval=0.8, maxval=1.25)

def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(jnp.stack([jnp.sum(x) for x in leaves if x.size])))

def lane(draws):
    n = draws.shape[0]
    pb = multistrain_ensemble_params(base, draws)
    y0b = multistrain_ensemble_state(y0, n)
    ctrl = ClipStepSizeController(PIDController(rtol=sp.ode_solver_rel_tolerance, atol=sp.ode_solver_abs_tolerance))
    sol = diffeqsolve(multistrain_ode_ensemble, sp.solver_method, 0.0, DURATION, None,
                      tuple(y0b), args=pb, stepsize_controller=ctrl,
                      saveat=SaveAt(ts=daily), step_budget=448)
    return sol.ys[-1][-1], sol.result, sol.stats["num_steps"]

fn = jax.jit(lane)
import math
for n in (39936, 79872, 159744):
    out = fn(_draws(n, 0))
    y, res, steps = jax.device_get(out)
    total = float(y.sum())
    print(f"n={n}: result={int(res)} steps={int(steps)} finite={math.isfinite(total)}")
    best = float("inf")
    for rep in range(3):
        d = _draws(n, rep + 1)
        t0 = time.perf_counter()
        _sync(fn(d)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"n={n}: lane adaptive {n/best:,.0f} traj/s", flush=True)
