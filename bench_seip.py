"""Secondary benchmark: production SEIP ensemble throughput on TPU.

The heavyweight tensor model (age x immune-history x vaccination x waning x
strain; 640-element state) run as a *lane-major* ensemble (batch axis
LAST) -- the one workload where that layout measurably beats batch-leading
vmap (~1.3x; the scatter updates and multi-axis contractions benefit).
Constant-step direct-save execution: no step buffer, only the
cumulative-incidence compartment is materialized. Timing ends with a host
fetch (remote-tunnel block_until_ready is unreliable).
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
    seip_ode_ensemble,
    seip_odeparams,
)

DURATION = 200
ENSEMBLE = 1024


def main():
    cfg = seip_config(
        seasonal_vaccination=True,
        solver_params=SolverParams(constant_step_size=0.5),
    )
    base = seip_odeparams(cfg)
    y0 = seip_ensemble_state(seip_initial_state(cfg), ENSEMBLE)

    def run(seed):
        # fresh draws per repeat; timing must END WITH A HOST FETCH -- on
        # the remote-tunnel backend block_until_ready can return before
        # the computation has executed (bench.py `_sync` note)
        scl = jax.random.uniform(
            jax.random.PRNGKey(seed), (ENSEMBLE,), minval=0.85, maxval=1.2
        )
        sol = simulate(
            seip_ode_ensemble, DURATION, y0, seip_ensemble_params(base, scl),
            cfg.parameters.solver_params,
            sub_save_indices=(3,),  # only materialize cumulative incidence
        )
        return sol.ys[3], sol.result

    t0 = time.perf_counter()
    out = run(0)
    float(jnp.sum(out[0]))
    compile_s = time.perf_counter() - t0
    n_fail = int(jnp.sum(out[1] != 0))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        out = run(rep + 1)
        float(jnp.sum(out[0]) + jnp.sum(out[1]))
        best = min(best, time.perf_counter() - t0)
    tps = ENSEMBLE / best
    print(
        f"[bench_seip] {ENSEMBLE} x {DURATION}d SEIP lane-major "
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
