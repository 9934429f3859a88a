"""Secondary benchmark: production SEIP ensemble throughput on TPU.

The heavyweight tensor model (age x immune-history x vaccination x waning x
strain; 640-element state) run as a vmapped parameter ensemble through the
generic XLA engine -- demonstrates scenario-scale throughput on the model
family the reference documents as its production shape (ode_model.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from dynode_tpu.config import SolverParams
from dynode_tpu.models.seip import (
    seip_config,
    seip_initial_state,
    seip_ode,
    seip_odeparams,
)
from dynode_tpu.simulation import simulate_ensemble

DURATION = 200
ENSEMBLE = 1024


def main():
    cfg = seip_config(
        seasonal_vaccination=True,
        solver_params=SolverParams(
            step_budget=512, ode_solver_abs_tolerance=1e-2
        ),
    )
    base = seip_odeparams(cfg)
    y0 = seip_initial_state(cfg)

    key = jax.random.PRNGKey(0)
    scales = jax.random.uniform(key, (ENSEMBLE,), minval=0.85, maxval=1.2)
    batch = jax.vmap(lambda s: base.replace(beta=base.beta * s))(scales)

    def run():
        sol = simulate_ensemble(
            seip_ode, DURATION, y0, batch, cfg.parameters.solver_params,
            sub_save_indices=(3,),  # only materialize cumulative incidence
        )
        return sol.ys[3], sol.result

    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    n_fail = int(jnp.sum(out[1] != 0))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    tps = ENSEMBLE / best
    print(
        f"[bench_seip] {ENSEMBLE} x {DURATION}d SEIP "
        f"(state 640, compile {compile_s:.0f}s, failures={n_fail}): "
        f"{tps:,.0f} traj/s",
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
