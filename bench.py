"""Benchmark: multi-strain age-stratified SEIRS trajectories/sec on TPU.

Workload (BASELINE.json "scenario ensemble" config): a ~10k-wide ensemble of
parameter-sampled multi-strain SEIRS solves (2 ages x 3 strains x 5
compartments, 200 days, daily saves).

Two TPU execution paths are measured:
1. **Pallas whole-solve-in-VMEM kernel** (primary): constant-step Tsit5 with
   the state resident in VMEM for the entire solve (dt=0.5; self-converged
   to ~2e-6 relative vs dt=0.125 on this workload).
2. Generic XLA path: the adaptive engine (Tsit5 + PID at reference
   tolerances, f32-scaled atol) under jit(vmap(...)), reported to stderr.

Prints one JSON line {"metric","value","unit","vs_baseline"}; vs_baseline is
the speedup over the same constant-step program on this host's CPU backend
(the reference framework is CPU-only -- SURVEY.md section 6 -- so
same-workload CPU wall-clock is the honest stand-in baseline).
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
    multistrain_ensemble_params,
    multistrain_ensemble_state,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_ode_ensemble,
    multistrain_odeparams,
)
from dynode_tpu.ops import ensemble_solve_tsit5

DURATION = 200.0
DT = 0.5
ENSEMBLE = 9984  # 10k rounded to the 256-lane block (BASELINE.md config)
# throughput saturates near 80k members on v5e-1 (measured: 222k traj/s at
# 10k -> 552k at 40k -> 623k at 80k -> 635k at 160k): the 10k workload
# under-fills the chip, so the headline is also measured at the knee
WIDE_ENSEMBLE = 79872
CPU_ENSEMBLE = 256


def _setup():
    cfg = multistrain_config(
        solver_params=SolverParams(
            step_budget=448,
            ode_solver_rel_tolerance=1e-5,
            ode_solver_abs_tolerance=1e-3,  # f32-scaled (see README)
        )
    )
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    return cfg, base, y0


def _draws(n, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (n,), minval=0.8, maxval=1.25)



def _sync(out):
    """Force execution AND completion: fetch a scalar reduction to host.

    ``block_until_ready`` on the remote-tunnel TPU backend can return
    before the computation has actually run (measured: 3 ms for a solve
    whose data fetch takes 180 ms), so every timed region must end with a
    host fetch of a value derived from the full result.
    """
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(jnp.stack([jnp.sum(x) for x in leaves if x.size])))


def bench_pallas(base, y0, n, repeats=3):
    def run(seed):
        # fresh parameter draws per repeat: guards against any result
        # caching/async artifacts in the measurement
        beta = base.beta[None, :] * _draws(n, seed)[:, None]
        return ensemble_solve_tsit5(
            y0, beta, base.sigma, base.gamma, base.omega,
            base.contact_matrix, batch=n, duration=DURATION, dt=DT,
        )

    _sync(run(0))  # compile
    best = float("inf")
    for rep in range(repeats):
        t0 = time.perf_counter()
        _sync(run(rep + 1))
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_lane_major_xla(base, y0, n, repeats=3):
    """Batch-last ensemble through the generic engine's constant direct-save
    path: the pure-XLA counterpart of the Pallas kernel's layout."""
    cfg_c = multistrain_config(
        solver_params=SolverParams(constant_step_size=DT)
    )
    y0b = multistrain_ensemble_state(y0, n)

    def run(seed):
        pb = multistrain_ensemble_params(base, _draws(n, seed))
        sol = simulate(
            multistrain_ode_ensemble, DURATION, y0b, pb,
            cfg_c.parameters.solver_params,
        )
        return sol.ys[4]

    _sync(run(0))
    best = float("inf")
    for rep in range(repeats):
        t0 = time.perf_counter()
        _sync(run(rep + 1))
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_batch_leading_xla(base, y0, n, repeats=3):
    """Batch-LEADING jit(vmap(simulate)) at constant step: the plain-JAX
    layout. Honest fetch-based timing shows XLA handles this well at wide
    ensembles (elementwise ops flatten across the batch), and it is
    usually the fastest path for small-state models."""
    sp = multistrain_config(
        solver_params=SolverParams(constant_step_size=DT)
    ).parameters.solver_params

    def solve_one(r0_scale):
        p = base.replace(beta=base.beta * r0_scale)
        sol = simulate(
            multistrain_ode, DURATION, y0, p, sp, sub_save_indices=(4,)
        )
        return sol.ys[4]

    fn = jax.jit(jax.vmap(solve_one))
    _sync(fn(_draws(n)))
    best = float("inf")
    for rep in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(_draws(n, rep + 1)))
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_xla_adaptive(cfg, base, y0, n, repeats=2):
    sp = cfg.parameters.solver_params

    def solve_one(r0_scale):
        p = base.replace(beta=base.beta * r0_scale)
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        return sol.ys[-1][-1], sol.result

    fn = jax.jit(jax.vmap(solve_one))
    out = fn(_draws(n))
    jax.block_until_ready(out)
    assert int(jnp.sum(out[1] != 0)) == 0, "adaptive path exhausted budget"
    best = float("inf")
    for rep in range(repeats):
        draws = _draws(n, rep + 1)
        t0 = time.perf_counter()
        _sync(fn(draws))
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_lane_adaptive(cfg, base, y0, n, repeats=3):
    """Lane-major adaptive through the save-grid-bounded engine: ONE shared
    PID dt chain whose error norm spans the whole ensemble (every member
    meets tolerance; dt tracks the stiffest member), adaptive steps landing
    exactly on the daily save grid, zero segment buffer. This is the
    production adaptive-ensemble path (round-3 redesign; the round-2
    buffered engine was width-flat at ~21k traj/s).

    steps_per_save=8: the shared chain pays the stiffest member's dt, so
    peak-epidemic days need more than the derived default of 4 steps;
    un-taken iterations are a real (scalar-predicate) branch in lane-major
    mode and cost almost nothing."""
    sp = cfg.parameters.solver_params.model_copy(
        update={"steps_per_save": 8}
    )
    y0b = multistrain_ensemble_state(y0, n)

    def run(seed):
        pb = multistrain_ensemble_params(base, _draws(n, seed))
        sol = simulate(multistrain_ode_ensemble, DURATION, y0b, pb, sp)
        return sol.ys[-1][-1], sol.result

    fn = jax.jit(run)
    out = fn(0)
    jax.block_until_ready(out)
    assert int(jnp.sum(out[1] != 0)) == 0, "adaptive path exhausted budget"
    best = float("inf")
    for rep in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(rep + 1)[0])
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_cpu_adaptive(cfg, base, y0, n):
    """Adaptive-program CPU baseline (same program as bench_xla_adaptive)."""
    cpu = jax.devices("cpu")[0]
    sp = cfg.parameters.solver_params

    def solve_one(r0_scale):
        p = base.replace(beta=base.beta * r0_scale)
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        return sol.ys[-1][-1]

    with jax.default_device(cpu):
        fn = jax.jit(jax.vmap(solve_one))
        jax.block_until_ready(fn(jax.device_put(_draws(n), cpu)))
        draws = jax.device_put(_draws(n, 1), cpu)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(draws))
        return n / (time.perf_counter() - t0)


def bench_cpu_constant(base, y0, n):
    """Constant-step CPU baseline: the SAME numerical program as the TPU
    headline (constant-step Tsit5, dt=DT, daily direct saves), measured in
    both layouts (batch-leading vmap and batch-last lane-major) with the
    better one reported -- so vs_baseline is a same-program, best-CPU-layout
    ratio, not adaptive-vs-constant apples-to-oranges."""
    cpu = jax.devices("cpu")[0]
    sp = multistrain_config(
        solver_params=SolverParams(constant_step_size=DT)
    ).parameters.solver_params

    def solve_one(r0_scale):
        p = base.replace(beta=base.beta * r0_scale)
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        return sol.ys[4]

    with jax.default_device(cpu):
        best = 0.0
        # layout 1: batch-leading vmap of the scalar RHS
        fn = jax.jit(jax.vmap(solve_one))
        jax.block_until_ready(fn(jax.device_put(_draws(n), cpu)))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jax.device_put(_draws(n, 1), cpu)))
        best = max(best, n / (time.perf_counter() - t0))
        # layout 2: batch-last lane-major ensemble RHS
        y0b = multistrain_ensemble_state(y0, n)

        def run_lane(draws):
            pb = multistrain_ensemble_params(base, draws)
            return simulate(multistrain_ode_ensemble, DURATION, y0b, pb, sp).ys[4]

        fn2 = jax.jit(run_lane)
        jax.block_until_ready(fn2(jax.device_put(_draws(n), cpu)))
        t0 = time.perf_counter()
        jax.block_until_ready(fn2(jax.device_put(_draws(n, 1), cpu)))
        best = max(best, n / (time.perf_counter() - t0))
        return best


def main():
    cfg, base, y0 = _setup()

    backend = jax.default_backend()
    if backend not in ("tpu",):
        print(
            f"[bench] WARNING: no TPU backend available (got {backend}); "
            "measuring the CPU fallback path",
            file=sys.stderr,
        )

    pallas_tps = bench_pallas(base, y0, ENSEMBLE)
    print(
        f"[bench] pallas whole-solve kernel: {pallas_tps:,.0f} traj/s "
        f"({ENSEMBLE} x {DURATION:.0f}d, dt={DT})",
        file=sys.stderr,
    )
    lane_tps = 0.0
    try:
        lane_tps = bench_lane_major_xla(base, y0, ENSEMBLE)
        print(
            f"[bench] lane-major XLA direct-save: {lane_tps:,.0f} traj/s",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] lane-major XLA path failed: {e}", file=sys.stderr)
    lead_tps = 0.0
    try:
        lead_tps = bench_batch_leading_xla(base, y0, ENSEMBLE)
        print(
            f"[bench] batch-leading jit(vmap):  {lead_tps:,.0f} traj/s",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] batch-leading XLA path failed: {e}", file=sys.stderr)
    tps = max(pallas_tps, lane_tps, lead_tps)

    wide_tps = 0.0
    try:
        wide_tps = bench_batch_leading_xla(base, y0, WIDE_ENSEMBLE)
        print(
            f"[bench] batch-leading at saturating width "
            f"({WIDE_ENSEMBLE}): {wide_tps:,.0f} traj/s",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] wide-ensemble path failed: {e}", file=sys.stderr)
    tps_best = max(tps, wide_tps)

    xla_tps = 0.0
    try:
        xla_tps = bench_xla_adaptive(cfg, base, y0, ENSEMBLE)
        print(
            f"[bench] xla adaptive per-member vmap: {xla_tps:,.0f} traj/s",
            file=sys.stderr,
        )
    except Exception as e:  # secondary measurement must not kill the bench
        print(f"[bench] xla adaptive path failed: {e}", file=sys.stderr)
    lane_adapt_tps = 0.0
    try:
        lane_adapt_tps = bench_lane_adaptive(cfg, base, y0, WIDE_ENSEMBLE)
        print(
            f"[bench] adaptive lane-major (shared dt chain, "
            f"{WIDE_ENSEMBLE}): {lane_adapt_tps:,.0f} traj/s",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] adaptive lane-major path failed: {e}", file=sys.stderr)
    adaptive_tps = max(xla_tps, lane_adapt_tps)

    # same-program ratios: constant/constant (headline) + adaptive/adaptive
    vs_baseline = 0.0
    vs_adaptive = 0.0
    try:
        cpu_const_tps = bench_cpu_constant(base, y0, CPU_ENSEMBLE)
        vs_baseline = tps_best / cpu_const_tps
        print(
            f"[bench] cpu constant-step baseline (same program, best "
            f"layout): {cpu_const_tps:,.0f} traj/s -> speedup "
            f"{vs_baseline:.1f}x",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] cpu constant baseline failed: {e}", file=sys.stderr)
    try:
        cpu_adapt_tps = bench_cpu_adaptive(cfg, base, y0, CPU_ENSEMBLE)
        vs_adaptive = adaptive_tps / cpu_adapt_tps if cpu_adapt_tps else 0.0
        print(
            f"[bench] cpu adaptive baseline:    {cpu_adapt_tps:,.0f} traj/s "
            f"-> adaptive/adaptive speedup {vs_adaptive:.1f}x",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] cpu adaptive baseline failed: {e}", file=sys.stderr)

    # ---- production SEIP model row (round-3 VMEM kernel headline) -------
    # The 640-float-state SEIP model is HBM-bound on the XLA path (knee at
    # ~4k members); the whole-solve-in-VMEM Pallas kernel keeps scaling
    # (54.6k/72k/122k/156k traj/s at 4k/8k/16k/32k). Gate on member-for-
    # member equivalence at B=1024 before reporting (bench_seip.py has the
    # full layout sweep; this row makes the win driver-visible).
    seip_tps = 0.0
    seip_xla_tps = 0.0
    try:
        import numpy as np

        from dynode_tpu.models.seip import (
            seip_config,
            seip_initial_state,
            seip_ode,
            seip_odeparams,
        )
        from dynode_tpu.ops.seip_pallas import seip_ensemble_solve

        seip_cfg = seip_config(
            seasonal_vaccination=True,
            solver_params=SolverParams(constant_step_size=0.5),
        )
        seip_base = seip_odeparams(seip_cfg)
        seip_y0 = seip_initial_state(seip_cfg)

        def seip_scales(n, seed):
            return jax.random.uniform(
                jax.random.PRNGKey(seed), (n,), minval=0.85, maxval=1.2
            )

        def seip_solve_one(scale):
            p = seip_base.replace(beta=seip_base.beta * scale)
            sol = simulate(
                seip_ode, 200, seip_y0, p,
                seip_cfg.parameters.solver_params, sub_save_indices=(3,),
            )
            return sol.ys[3]

        seip_lead = jax.jit(jax.vmap(seip_solve_one))

        def seip_kernel(n, seed):
            # bf16 saves halve the HBM output buffer (the kernel's width
            # bound) AND its DMA traffic: measured 169k traj/s at B=32768
            # vs 133k with f32 saves at the same width (state math stays
            # exact f32 in VMEM; probes/probe_seip_bf16_width.py)
            return seip_ensemble_solve(
                seip_y0, seip_base, seip_scales(n, seed),
                duration=200, dt=0.5, save=(3,), save_dtype=jnp.bfloat16,
            )[0].astype(jnp.float32)

        # equivalence gate at B=1024 (kernel RK4 + bf16-rounded saves vs
        # XLA Tsit5 f32, same scales; bf16's ~4e-3 grid << the 2e-2 gate)
        kc = np.asarray(jax.device_get(seip_kernel(1024, 0)))[-1]
        xc = np.moveaxis(
            np.asarray(jax.device_get(seip_lead(seip_scales(1024, 0))))[:, -1],
            0, -1,
        )
        mdiff = float(
            np.max(np.abs(kc - xc) / np.maximum(np.abs(xc), 1.0))
        )
        if mdiff > 2e-2:
            raise RuntimeError(f"kernel equivalence failed ({mdiff:.2e})")
        xla_best = float("inf")
        for rep in range(2):  # min-of-2: single tunnel timings can be 7x off
            t0 = time.perf_counter()
            _sync(seip_lead(seip_scales(1024, rep + 1)))
            xla_best = min(xla_best, time.perf_counter() - t0)
        seip_xla_tps = 1024 / xla_best
        best = float("inf")
        _sync(seip_kernel(32768, 1))  # compile at headline width
        for rep in range(2):
            t0 = time.perf_counter()
            _sync(seip_kernel(32768, rep + 2))
            best = min(best, time.perf_counter() - t0)
        seip_tps = 32768 / best
        print(
            f"[bench] SEIP VMEM kernel (B=32768, bf16 C-only saves): "
            f"{seip_tps:,.0f} traj/s (equivalence {mdiff:.2e}; XLA "
            f"batch-leading at 1024: {seip_xla_tps:,.0f})",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] SEIP kernel row failed: {e}", file=sys.stderr)

    # ---- second half of the BASELINE.md headline: NUTS/ChEES ESS per sec
    # and the matched-quality north-star ratio, folded into the same JSON
    # artifact the driver captures (VERDICT round 2, item 3) -------------
    ess_per_sec = 0.0
    matched_quality = matched_quality_tuned = 0.0
    try:
        import numpy as np

        import bench_nuts

        model, forward = bench_nuts.build_model()
        true_scales = jnp.array([1.1, 0.95, 1.05])
        c = forward(true_scales)
        obs = jax.random.poisson(
            jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6)
        )
        ess_per_sec, chees_post = bench_nuts.bench_chees(model, obs)
        drift = float(np.max(np.abs(chees_post - np.asarray(true_scales))))
        if drift > 0.05:
            print(
                f"[bench] ChEES posterior drift {drift:.3f}; voiding ESS/s",
                file=sys.stderr,
            )
            ess_per_sec = 0.0
        matched_quality, matched_quality_tuned, *_ = (
            bench_nuts.bench_matched_quality(model, obs)
        )
    except Exception as e:
        print(f"[bench] ESS/matched-quality measurement failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "multistrain_seirs_trajectories_per_sec",
                "value": round(tps_best, 1),
                "unit": "traj/s",
                "vs_baseline": round(vs_baseline, 2),
                "vs_baseline_adaptive_same_program": round(vs_adaptive, 2),
                "ensemble_width": (
                    WIDE_ENSEMBLE if wide_tps >= tps else ENSEMBLE
                ),
                "value_at_10k": round(tps, 1),
                "traj_per_sec": round(tps_best, 1),
                "traj_per_sec_adaptive": round(adaptive_tps, 1),
                "ess_per_sec": round(ess_per_sec, 1),
                "matched_quality_speedup": round(matched_quality, 1),
                "matched_quality_speedup_tuned_cpu": round(
                    matched_quality_tuned, 1
                ),
                "seip_traj_per_sec": round(seip_tps, 1),
                "seip_traj_per_sec_xla_1k": round(seip_xla_tps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
