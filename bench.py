"""Benchmark: multi-strain age-stratified SEIRS trajectories/sec on TPU.

Workload (BASELINE.json "scenario ensemble" config): a 10k-wide vmapped
ensemble of parameter-sampled multi-strain SEIRS solves (2 ages x 3 strains
x 5 compartments, 200 days, adaptive Tsit5 at the reference tolerances
rtol=1e-5/atol=1e-6), compiled as ONE XLA program on the TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup over the same program executed on this host's
CPU backend (the reference is a CPU-only framework -- SURVEY.md section 6 --
so same-workload CPU wall-clock is the honest stand-in baseline).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_odeparams,
)

DURATION = 200
ENSEMBLE = 10_000
CPU_ENSEMBLE = 256  # CPU baseline extrapolates from a smaller batch


def build(step_budget):
    # reference tolerances assume f64 CPU; on f32 TPU an atol of 1e-6
    # against populations of ~1e3 is below float32 resolution and makes the
    # controller thrash. Keep the same rtol and scale atol to the state
    # magnitude (1e-3 absolute on a 1000-person population == 1e-6 relative,
    # i.e. the same accuracy target the reference encodes).
    cfg = multistrain_config(
        solver_params=SolverParams(
            step_budget=step_budget,
            ode_solver_rel_tolerance=1e-5,
            ode_solver_abs_tolerance=1e-3,
        )
    )
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    sp = cfg.parameters.solver_params

    def solve_one(draw):
        r0_scale, inf_scale = draw
        p = base.replace(
            beta=base.beta * r0_scale / inf_scale,
            gamma=base.gamma / inf_scale,
        )
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        # reduce to the final cumulative-incidence tensor so the benchmark
        # returns O(ensemble) bytes, not the full timeseries
        return sol.ys[-1][-1], sol.stats["num_steps"], sol.result

    return solve_one


def sample_draws(key, n):
    k1, k2 = jax.random.split(key)
    r0_scale = jax.random.uniform(k1, (n,), minval=0.8, maxval=1.25)
    inf_scale = jax.random.uniform(k2, (n,), minval=0.85, maxval=1.15)
    return jnp.stack([r0_scale, inf_scale], axis=-1)


def run_on(device, n, step_budget, repeats=3):
    solve_one = build(step_budget)
    fn = jax.jit(jax.vmap(solve_one))
    draws = jax.device_put(
        sample_draws(jax.random.PRNGKey(0), n), device
    )
    # compile + warmup
    out = fn(draws)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(draws)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    c_final, steps, results = out
    n_fail = int(jnp.sum(results != 0))
    max_steps = int(jnp.max(steps))
    return n / best, n_fail, max_steps


def main():
    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    accel = tpu_devices[0] if tpu_devices else jax.devices()[0]
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    # pilot to tune the scan budget (the main throughput lever)
    pilot_tps, _, pilot_steps = run_on(accel, 64, 1024, repeats=1)
    budget = max(64, -(-int(pilot_steps * 1.3) // 64) * 64)
    print(f"[bench] pilot: max {pilot_steps} steps -> budget {budget}",
          file=sys.stderr)

    tps, n_fail, max_steps = run_on(accel, ENSEMBLE, budget)
    print(
        f"[bench] accel={accel.platform} {ENSEMBLE} trajectories x "
        f"{DURATION}d: {tps:,.0f} traj/s (max_steps={max_steps}, "
        f"failures={n_fail})",
        file=sys.stderr,
    )
    assert n_fail == 0, "some ensemble members exhausted the step budget"

    vs_baseline = 0.0
    if cpu is not None and cpu != accel:
        cpu_tps, _, _ = run_on(cpu, CPU_ENSEMBLE, budget, repeats=1)
        vs_baseline = tps / cpu_tps
        print(
            f"[bench] cpu baseline: {cpu_tps:,.0f} traj/s -> "
            f"speedup {vs_baseline:.1f}x",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "multistrain_seirs_trajectories_per_sec",
                "value": round(tps, 1),
                "unit": "traj/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
