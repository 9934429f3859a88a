"""Secondary benchmark: production SEIP ensemble throughput on TPU.

The heavyweight tensor model (age x immune-history x vaccination x waning x
strain; 640-element state) measured in BOTH ensemble layouts -- lane-major
(batch-LAST; the scatter updates and multi-axis contractions benefit,
~1.3x at B=256) and batch-leading jit(vmap) -- with the better one
reported. Constant-step direct-save execution: only the
cumulative-incidence compartment is materialized. Timing ends with a host
fetch (remote-tunnel block_until_ready is unreliable) and uses fresh
draws per repeat.

Roofline position (measured, v5e-1, B=1024): ~170ms per 200-day dt=0.5
solve = 2800 RHS evals -> ~60us per ensemble RHS. The RHS must move the
640*B f32 state (2.6 MB) in and out of HBM per evaluation plus
intermediates of comparable size; at ~800 GB/s that floor is ~10-20us, so
the XLA path sits within ~3-4x of the bandwidth bound -- the remaining
gap is the scatter (.at[].add) copies and small-tensor bookkeeping. A
whole-solve-in-VMEM Pallas kernel is the only way past that bound, but the
multistrain experience (Pallas SLOWER than XLA batch-leading under honest
timing) says the win is not guaranteed; the XLA path is kept as the
production configuration.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config,
    seip_ensemble_params,
    seip_ensemble_state,
    seip_initial_state,
    seip_ode,
    seip_ode_ensemble,
    seip_odeparams,
)

DURATION = 200
ENSEMBLE = 1024


def _time(run, repeats=3):
    t0 = time.perf_counter()
    out = run(0)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for rep in range(repeats):
        t0 = time.perf_counter()
        out = run(rep + 1)
        float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    cfg = seip_config(
        seasonal_vaccination=True,
        solver_params=SolverParams(constant_step_size=0.5),
    )
    base = seip_odeparams(cfg)
    y0 = seip_initial_state(cfg)
    y0b = seip_ensemble_state(y0, ENSEMBLE)

    def draws(seed):
        return jax.random.uniform(
            jax.random.PRNGKey(seed), (ENSEMBLE,), minval=0.85, maxval=1.2
        )

    def run_lane(seed):
        sol = simulate(
            seip_ode_ensemble, DURATION, y0b,
            seip_ensemble_params(base, draws(seed)),
            cfg.parameters.solver_params,
            sub_save_indices=(3,),
        )
        return sol.ys[3]

    def solve_one(scale):
        p = base.replace(beta=base.beta * scale)
        sol = simulate(
            seip_ode, DURATION, y0, p, cfg.parameters.solver_params,
            sub_save_indices=(3,),
        )
        return sol.ys[3]

    lead_fn = jax.jit(jax.vmap(solve_one))

    def run_lead(seed):
        return lead_fn(draws(seed))

    results = {}
    for name, run in (("lane-major", run_lane), ("batch-leading", run_lead)):
        try:
            best, compile_s = _time(run)
            results[name] = ENSEMBLE / best
            print(
                f"[bench_seip] {name}: {ENSEMBLE / best:,.0f} traj/s "
                f"(compile {compile_s:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench_seip] {name} failed: {e}", file=sys.stderr)
    tps = max(results.values())
    winner = max(results, key=results.get)
    print(
        f"[bench_seip] {ENSEMBLE} x {DURATION}d SEIP (state 640): "
        f"{tps:,.0f} traj/s ({winner})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "seip_trajectories_per_sec",
                "value": round(tps, 1),
                "unit": "traj/s",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
