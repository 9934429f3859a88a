"""Ablation probe: where does the adaptive ensemble path spend its time?

Measures (fetch-synced, fresh draws per repeat):
  A. batch-leading vmap adaptive, daily saves   (the current 21k traj/s path)
  B. batch-leading vmap adaptive, 2 save points (post-pass nearly removed)
  C. lane-major adaptive (shared dt chain), daily saves
  D. lane-major adaptive, 2 save points
  E. constant-step direct-save batch-leading    (the 250k reference point)
at 10k and 40k widths.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import time

import jax
import jax.numpy as jnp

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_ensemble_params,
    multistrain_ensemble_state,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_ode_ensemble,
    multistrain_odeparams,
)
from dynode_tpu.ode import SaveAt, PIDController, ClipStepSizeController, diffeqsolve
from dynode_tpu.ode.solvers import Tsit5

DURATION = 200.0

cfg = multistrain_config(
    solver_params=SolverParams(
        step_budget=448,
        ode_solver_rel_tolerance=1e-5,
        ode_solver_abs_tolerance=1e-3,
    )
)
sp = cfg.parameters.solver_params
base = multistrain_odeparams(cfg)
y0 = multistrain_initial_state(cfg)


def _draws(n, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (n,), minval=0.8, maxval=1.25)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(jnp.stack([jnp.sum(x) for x in leaves if x.size])))


def _time(fn, n, repeats=3):
    _sync(fn(_draws(n, 0)))
    best = float("inf")
    for rep in range(repeats):
        d = _draws(n, rep + 1)
        t0 = time.perf_counter()
        _sync(fn(d))
        best = min(best, time.perf_counter() - t0)
    return n / best


def solve_adaptive(p, save_ts):
    ctrl = ClipStepSizeController(
        PIDController(rtol=sp.ode_solver_rel_tolerance, atol=sp.ode_solver_abs_tolerance)
    )
    return diffeqsolve(
        multistrain_ode, sp.solver_method, 0.0, DURATION, None, tuple(y0),
        args=p, stepsize_controller=ctrl, saveat=SaveAt(ts=save_ts),
        step_budget=448,
    )


daily = jnp.linspace(0.0, DURATION, 201)
two = jnp.asarray([0.0, DURATION])


def a_fn(draws):
    def one(r0):
        sol = solve_adaptive(base.replace(beta=base.beta * r0), daily)
        return sol.ys[-1][-1]
    return jax.vmap(one)(draws)


def b_fn(draws):
    def one(r0):
        sol = solve_adaptive(base.replace(beta=base.beta * r0), two)
        return sol.ys[-1][-1]
    return jax.vmap(one)(draws)


def lane(draws, save_ts):
    n = draws.shape[0]
    pb = multistrain_ensemble_params(base, draws)
    y0b = multistrain_ensemble_state(y0, n)
    ctrl = ClipStepSizeController(
        PIDController(rtol=sp.ode_solver_rel_tolerance, atol=sp.ode_solver_abs_tolerance)
    )
    sol = diffeqsolve(
        multistrain_ode_ensemble, sp.solver_method, 0.0, DURATION, None,
        tuple(y0b), args=pb, stepsize_controller=ctrl,
        saveat=SaveAt(ts=save_ts), step_budget=448,
    )
    return sol.ys[-1][-1]


def c_fn(draws):
    return lane(draws, daily)


def d_fn(draws):
    return lane(draws, two)


sp_const = SolverParams(constant_step_size=0.5)


def e_fn(draws):
    def one(r0):
        sol = simulate(
            multistrain_ode, DURATION, y0, base.replace(beta=base.beta * r0),
            sp_const, sub_save_indices=(4,),
        )
        return sol.ys[4]
    return jax.vmap(one)(draws)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for n in (9984, 39936):
        for name, fn in [("A vmap+daily", jax.jit(a_fn)),
                         ("B vmap+2pt  ", jax.jit(b_fn)),
                         ("C lane+daily", jax.jit(c_fn)),
                         ("D lane+2pt  ", jax.jit(d_fn)),
                         ("E const dir ", jax.jit(e_fn))]:
            try:
                tps = _time(fn, n)
                print(f"n={n:6d}  {name}: {tps:10,.0f} traj/s", flush=True)
            except Exception as e:
                print(f"n={n:6d}  {name}: FAILED {type(e).__name__}: {e}", flush=True)
