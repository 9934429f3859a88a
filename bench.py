"""Benchmark: multi-strain age-stratified SEIRS trajectories/sec on TPU.

Workload (BASELINE.json "scenario ensemble" config): a ~10k-wide ensemble of
parameter-sampled multi-strain SEIRS solves (2 ages x 3 strains x 5
compartments, 200 days, daily saves), plus the production SEIP model row and
the ESS/sec + matched-quality inference rows.

Measurement discipline (round-4 hardening, VERDICT r3 items 2/6):
- every TPU headline is the MEDIAN of 3 same-session repeats with fresh
  inputs; the JSON carries {median, spread, n} per measurement,
- the CPU baseline is a PINNED constant (bench_pins.json), re-measured only
  with --remeasure-baseline -- round 1-3 re-measured it per session on a
  loaded host, which swung vs_baseline 141x -> 67x -> 58x on an unchanged
  program,
- cold compile time of the headline program is measured against a pinned
  budget so warm-cache wins cannot mask cold-path regressions,
- roofline per headline path: XLA cost analysis for the XLA rows; analytic
  RHS-flop x attempt-count rooflines (VPU utilization estimate + save-DMA
  GB/s) for the Pallas kernel rows,
- metrics are compared against the prior round's values (bench_pins.json
  prior_medians): anything below 0.7x is flagged loudly in "regressions".

Artifact robustness (round-5 hardening, VERDICT r4 item 1 -- BENCH_r04 was
rc=124/parsed=null after the added rows outgrew the driver window):
- the on-disk XLA executable cache is enabled up front
  (dynode_tpu.enable_compilation_cache): a code-unchanged rerun skips the
  multi-minute tunnel compiles,
- the JSON result line is emitted INCREMENTALLY: after every stage a
  complete, self-contained line is printed, so whichever line the driver
  parses (first, last, or post-timeout tail) is a valid record,
- rows are ordered by evidentiary value and each expensive row is
  deadline-guarded (DYNODE_BENCH_DEADLINE_S, default 1680s; --extended
  disables): the bench SKIPS rows loudly rather than dying mid-row,
- DYNODE_BENCH_SMALL=1 smoke-tests the full control flow on CPU.

Prints JSON lines {"metric","value","unit","vs_baseline",...}; the LAST
line is the most complete record.
"""

import json
import os
import statistics
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
# the VMEM kernel saturates later than XLA (sequential grid blocks: wider
# just adds blocks at full rate): 1.24M traj/s at 80k -> 1.87M at 160k
# (quiet tunnel, auto block_b=2048); 320k OOMs the (T, D, B) save buffer
KERNEL_WIDE_ENSEMBLE = 163840
# observable-only saves (save_rows) quarter the save buffer: 4x wider still.
# Round 4: the recorded "491520 OOMs in every variant" was an allocation-
# poisoning artifact (the genuinely-OOM full-f32 launch ran FIRST in the
# same process); fresh-process obs-saves scale to 983040 @ 5.67M traj/s
# (probes/probe_save_rows_width.py). 655360 leaves in-bench HBM headroom.
OBS_WIDE_ENSEMBLE = 655360
CPU_ENSEMBLE = 256

#: DYNODE_BENCH_SMALL=1: shrink every width so the bench's control flow
#: (stage ordering, incremental emission, gates, JSON schema) can be
#: smoke-tested on the CPU fallback in seconds. Numbers are meaningless in
#: this mode; inference/SEIP/oneshot stages are skipped.
SMALL = bool(os.environ.get("DYNODE_BENCH_SMALL"))
if SMALL:
    ENSEMBLE = 256
    WIDE_ENSEMBLE = 512
    KERNEL_WIDE_ENSEMBLE = 512
    OBS_WIDE_ENSEMBLE = 512

# v5e single-chip peaks (public spec; see probes/probe_seip_roofline.py)
HBM_PEAK_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0
MXU_F32_TFLOPS = 98.0

PINS_PATH = "bench_pins.json"

#: per-measurement wall-clock lists (seconds), for {median, spread, n}
WALLS: dict = {}


def _load_pins():
    try:
        with open(PINS_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


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


def _timed_median(name, run, n, repeats=3):
    """Median-of-``repeats`` trajectories/sec with fresh inputs per repeat.

    The caller must have warmed/compiled ``run`` already. Walls are
    recorded in :data:`WALLS` for the {median, spread, n} JSON block.
    Fresh seeds per repeat guard against result-caching artifacts.
    """
    walls = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        _sync(run(100 + rep))
        walls.append(time.perf_counter() - t0)
    WALLS[name] = walls
    return n / statistics.median(walls)


def _measurements_block():
    out = {}
    for name, walls in WALLS.items():
        med = statistics.median(walls)
        out[name] = {
            "median_s": round(med, 4),
            "spread": round((max(walls) - min(walls)) / med, 3) if med else 0,
            "n": len(walls),
        }
    return out


def _roofline(compiled, wall_s):
    """Achieved bandwidth/flops vs v5e peaks from XLA's own cost analysis."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        ba = float(ca.get("bytes accessed", float("nan")))
        gbps = ba / wall_s / 1e9
        tflops = flops / wall_s / 1e12
        return {
            "achieved_gbps": round(gbps, 1),
            "achieved_tflops": round(tflops, 3),
            "hbm_utilization": round(gbps / HBM_PEAK_GBPS, 4),
            "flop_utilization_f32": round(tflops / MXU_F32_TFLOPS, 5),
        }
    except Exception as e:  # cost analysis unavailable on some backends
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)
        return {}


def bench_pallas(base, y0, n, repeats=3, name="pallas_multistrain"):
    """Whole-solve VMEM kernel; block_b auto-selects (1024+ lanes at wide
    widths -- the round-4 block sweep's 1.8x lever, see
    probes/probe_multistrain_block_sweep.py)."""
    def run(seed):
        beta = base.beta[None, :] * _draws(n, seed)[:, None]
        return ensemble_solve_tsit5(
            y0, beta, base.sigma, base.gamma, base.omega,
            base.contact_matrix, batch=n, duration=DURATION, dt=DT,
        )

    out = run(0)  # compile
    s = _sync(out)
    assert jnp.isfinite(jnp.asarray(s)), "pallas kernel produced non-finite"
    return _timed_median(name, run, n, repeats)


def bench_generic_kernel(
    base, y0, n, repeats=3, name="generic_kernel", save_rows=None,
    save_dtype=jnp.float32,
):
    """Round-4 generic rows-RHS whole-solve engine, production-shaped: per
    repeat a FRESH parameter draw is packed and solved inside ONE jitted
    program (packing fuses with the kernel launch instead of dispatching
    eager transposes -- the specialized-entry rows pay that eagerly).

    ``save_rows="c"`` saves only the A*K cumulative-incidence rows (the
    rows a fit observes) -- the (T, rows, B) save buffer bounds the
    kernel's max width, so observable-only bf16 saves unlock ~2x the
    widest f32 full-rows ensemble (probes/probe_save_rows_width.py);
    gated against the full-rows solve on a 2048-lane slice. Obs rows run
    ``padded_rows=True``: the exact-rows result is a full-size post-kernel
    copy (Mosaic save DMAs need 8-aligned row tiles), so returning the raw
    8-padded buffer skips ~1.7x HBM traffic/peak at max width -- the gate
    slices the live rows outside the timed region."""
    import dynode_tpu.ops.multistrain_pallas as mp
    from dynode_tpu.ops import ensemble_solve_kernel

    A, K = mp.A_DIM, mp.K_DIM
    D = mp._d_rows(A, K)
    rows_sel = tuple(range(D - A * K, D)) if save_rows == "c" else None
    contact = tuple(
        tuple(float(v) for v in row)
        for row in jnp.asarray(base.contact_matrix).tolist()
    )

    def rhs(y, p, t):
        return mp._rhs_rows(
            y, contact, p[:K], p[K:2 * K], p[2 * K:3 * K], p[3 * K:4 * K],
            A, K,
        )

    y_packed = mp.pack_state(y0, n)

    def pack(nn, scales):
        beta = base.beta[None, :] * scales[:, None]
        return mp.pack_params(beta, base.sigma, base.gamma, base.omega, nn)

    @jax.jit
    def fused(yp, scales):
        return ensemble_solve_kernel(
            rhs, yp, pack(yp.shape[1], scales), duration=DURATION, dt=DT,
            save_rows=rows_sel, save_dtype=save_dtype,
            padded_rows=rows_sel is not None,
        )

    def run(seed):
        return fused(y_packed, _draws(n, seed))

    s = _sync(run(0))  # compile
    assert jnp.isfinite(jnp.asarray(s)), "generic kernel produced non-finite"
    if rows_sel is not None:
        # equivalence gate: selected rows == the full-rows solve's slice
        # (same solve math; only save staging/dtype differ)
        m = min(2048, n)
        scales_s = _draws(n, 0)[:m]
        yp_s = y_packed[:, :m]
        sel = fused(yp_s, scales_s)[:, :len(rows_sel), :].astype(jnp.float32)
        full = ensemble_solve_kernel(
            rhs, yp_s, pack(m, scales_s), duration=DURATION, dt=DT,
        )[:, list(rows_sel), :].astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(sel - full)) / jnp.max(jnp.abs(full)))
        assert rel < 1e-2, f"save_rows gate failed: rel {rel:.2e}"
    return _timed_median(name, run, n, repeats)


def bench_generic_adaptive(
    base, y0, n, repeats=3, name="generic_adaptive", save_rows=None,
):
    """Round-4 adaptive generic kernel: lockstep-dt BS3(2) at rtol=1e-4
    with bf16 save staging (halves the (T,R,B) buffer -- f32 OOMs at
    163840) -- the reference's DEFAULT solve mode (adaptive) on the
    whole-solve VMEM path for a user rows-RHS. Accuracy-gated against the
    dt=0.05 constant kernel on a 2048-member slice; budget exhaustion in
    any block voids the row."""
    import dynode_tpu.ops.multistrain_pallas as mp
    from dynode_tpu.ops import (
        ensemble_solve_kernel,
        ensemble_solve_kernel_adaptive,
    )

    A, K = mp.A_DIM, mp.K_DIM
    contact = tuple(
        tuple(float(v) for v in row)
        for row in jnp.asarray(base.contact_matrix).tolist()
    )

    def rhs(y, p, t):
        return mp._rhs_rows(
            y, contact, p[:K], p[K:2 * K], p[2 * K:3 * K], p[3 * K:4 * K],
            A, K,
        )

    def pack(nn, scales):
        beta = base.beta[None, :] * scales[:, None]
        return mp.pack_params(beta, base.sigma, base.gamma, base.omega, nn)

    D = mp._d_rows(A, K)
    rows_sel = tuple(range(D - A * K, D)) if save_rows == "c" else None
    y_packed = mp.pack_state(y0, n)

    @jax.jit
    def fused(yp, scales):
        return ensemble_solve_kernel_adaptive(
            rhs, yp, pack(yp.shape[1], scales), duration=DURATION,
            rtol=1e-4, atol=1e-6, save_dtype=jnp.bfloat16,
            save_rows=rows_sel, padded_rows=rows_sel is not None,
        )

    out, stats = fused(y_packed, _draws(n, 0))  # compile
    _sync(out)
    bad = int(jnp.asarray(stats["exhausted_intervals"]).sum())
    assert bad == 0, f"adaptive generic kernel exhausted budget in {bad} blocks"
    attempts = int(
        (jnp.asarray(stats["n_accepted"]) + jnp.asarray(stats["n_rejected"]))
        .sum()
    )
    n_blocks = int(jnp.asarray(stats["n_accepted"]).shape[0])
    # accuracy gate on a slice (matches probe_generic_adaptive.py)
    m = min(2048, n)
    scales = _draws(n, 0)[:m]
    yp_s = y_packed[:, :m]
    pp_s = pack(m, scales)
    ref = ensemble_solve_kernel(
        rhs, yp_s, pp_s, duration=DURATION, dt=0.05, save_rows=rows_sel,
    )
    got, _ = ensemble_solve_kernel_adaptive(
        rhs, yp_s, pp_s, duration=DURATION, rtol=1e-4, atol=1e-6,
        save_rows=rows_sel,
    )
    rel = float(jnp.max(jnp.abs(got - ref) / (1e-6 + jnp.abs(ref))))
    assert rel < 5e-3, f"adaptive generic accuracy gate failed: {rel}"
    tps = _timed_median(name, lambda s: fused(y_packed, _draws(n, s))[0],
                        n, repeats)
    info = {
        "attempts_total": attempts,
        "n_blocks": n_blocks,
        "block_b": n // max(n_blocks, 1),
        "n_save_rows": len(rows_sel) if rows_sel is not None else D,
        "rows_padded": rows_sel is not None,
    }
    return tps, rel, info


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
    return _timed_median("lane_major_xla", run, n, repeats)


def bench_batch_leading_xla(base, y0, n, repeats=3, name="batch_leading"):
    """Batch-LEADING jit(vmap(simulate)) at constant step: the plain-JAX
    layout; fastest path for small-state models at wide ensembles.

    Returns (traj/s median, cold_compile_s, roofline dict)."""
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
    d0 = _draws(n)
    t0 = time.perf_counter()
    compiled = fn.lower(d0).compile()
    cold_compile_s = time.perf_counter() - t0
    _sync(fn(d0))  # warm
    tps = _timed_median(name, lambda s: fn(_draws(n, s)), n, repeats)
    roof = _roofline(compiled, statistics.median(WALLS[name]))
    return tps, cold_compile_s, roof


def bench_xla_adaptive(cfg, base, y0, n, repeats=3):
    sp = cfg.parameters.solver_params

    def solve_one(r0_scale):
        p = base.replace(beta=base.beta * r0_scale)
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        return sol.ys[-1][-1], sol.result

    fn = jax.jit(jax.vmap(solve_one))
    out = fn(_draws(n))
    jax.block_until_ready(out)
    assert int(jnp.sum(out[1] != 0)) == 0, "adaptive path exhausted budget"
    return _timed_median(
        "xla_adaptive_vmap", lambda s: fn(_draws(n, s))[0], n, repeats
    )


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
    return _timed_median(
        "lane_adaptive", lambda s: fn(s)[0], n, repeats
    )


def bench_cpu_adaptive(cfg, base, y0, n):
    """Adaptive-program CPU baseline (same program as bench_xla_adaptive).

    Run only under --remeasure-baseline; the result is pinned in
    bench_pins.json."""
    cpu = jax.devices("cpu")[0]
    sp = cfg.parameters.solver_params

    def solve_one(r0_scale):
        p = base.replace(beta=base.beta * r0_scale)
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        return sol.ys[-1][-1]

    with jax.default_device(cpu):
        fn = jax.jit(jax.vmap(solve_one))
        jax.block_until_ready(fn(jax.device_put(_draws(n), cpu)))
        walls = []
        for rep in range(3):
            draws = jax.device_put(_draws(n, rep + 1), cpu)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(draws))
            walls.append(time.perf_counter() - t0)
        WALLS["cpu_adaptive"] = walls
        return n / statistics.median(walls)


def bench_cpu_constant(base, y0, n):
    """Constant-step CPU baseline: the SAME numerical program as the TPU
    headline, measured in both layouts with the better one reported.

    Run only under --remeasure-baseline; the result is pinned in
    bench_pins.json so session-to-session host load cannot move the
    denominator of vs_baseline."""
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
        walls = []
        for rep in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jax.device_put(_draws(n, rep + 1), cpu)))
            walls.append(time.perf_counter() - t0)
        best = max(best, n / statistics.median(walls))
        # layout 2: batch-last lane-major ensemble RHS
        y0b = multistrain_ensemble_state(y0, n)

        def run_lane(draws):
            pb = multistrain_ensemble_params(base, draws)
            return simulate(multistrain_ode_ensemble, DURATION, y0b, pb, sp).ys[4]

        fn2 = jax.jit(run_lane)
        jax.block_until_ready(fn2(jax.device_put(_draws(n), cpu)))
        walls = []
        for rep in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn2(jax.device_put(_draws(n, rep + 1), cpu)))
            walls.append(time.perf_counter() - t0)
        best = max(best, n / statistics.median(walls))
        return best


#: wall-clock start of the bench process (module import ~= process start)
T0 = time.perf_counter()
#: soft deadline: rows are skipped (loudly) once the remaining window
#: cannot fit them, so the driver's hard timeout can never void the
#: artifact again (round-4 lesson: BENCH_r04.json rc=124, parsed null).
DEADLINE_S = float(os.environ.get("DYNODE_BENCH_DEADLINE_S", "1680"))
EXTENDED = False

# v5e single-chip VPU f32 peak ESTIMATE: 1024 lanes x 4 ALUs x ~0.94 GHz
# ~= 3.9 TFLOP/s. Unlike the HBM/MXU numbers this is not a published spec;
# it is used only to express kernel throughput as a fraction of a
# VPU-bound ceiling (the kernels are elementwise VPU work, not MXU).
VPU_F32_TFLOPS_EST = 3.9


def _elapsed():
    return time.perf_counter() - T0


def _note(msg):
    print(f"[bench t={_elapsed():5.0f}s] {msg}", file=sys.stderr)


def _have(budget_s, label):
    """True if ``label`` (worst-case ``budget_s``) fits the soft window."""
    if EXTENDED or _elapsed() + budget_s < DEADLINE_S:
        return True
    _note(
        f"SKIP {label}: needs ~{budget_s:.0f}s, "
        f"{max(DEADLINE_S - _elapsed(), 0):.0f}s left "
        "(--extended or DYNODE_BENCH_DEADLINE_S to override)"
    )
    return False


def _rows_rhs_flops_per_member(rhs, n_rows, n_params):
    """HLO-counted flops of ONE rows-RHS evaluation per ensemble member.

    Compiled on the local CPU backend (cheap, no tunnel); XLA's flop count
    is backend-agnostic at this level. Basis for the kernel rooflines:
    total kernel flops = flops/member/eval x evals x members.
    """
    cpu = jax.devices("cpu")[0]
    bb = 256
    y = jnp.ones((n_rows, bb), jnp.float32)
    p = jnp.ones((max(n_params, 1), bb), jnp.float32)

    def f(y, p):
        rows = rhs(
            [y[i] for i in range(n_rows)],
            [p[i] for i in range(n_params)],
            jnp.float32(0.0),
        )
        return jnp.stack(list(rows))

    with jax.default_device(cpu):
        ca = jax.jit(f).lower(y, p).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)) / bb


def _kernel_roofline_const(name, batch, n_evals_per_member, rhs_flops,
                           save_bytes):
    """Analytic roofline for a constant-step whole-solve kernel row."""
    wall = statistics.median(WALLS[name])
    tflops = rhs_flops * n_evals_per_member * batch / wall / 1e12
    return {
        "achieved_tflops": round(tflops, 3),
        "vpu_utilization_est": round(tflops / VPU_F32_TFLOPS_EST, 4),
        "save_dma_gbps": round(save_bytes / wall / 1e9, 2),
        "hbm_utilization_saves": round(
            save_bytes / wall / 1e9 / HBM_PEAK_GBPS, 4
        ),
    }


def _emit(result):
    """Print the CURRENT result as one complete JSON line (incremental).

    Every emission is self-contained and monotonically growing, so
    whichever line the driver parses (first or last, even after a hard
    timeout truncates the run) is a valid benchmark record.
    """
    out = dict(result)
    out["elapsed_s"] = round(_elapsed(), 1)
    out["measurements"] = _measurements_block()
    print(json.dumps(out), flush=True)


def main():
    global EXTENDED
    remeasure = "--remeasure-baseline" in sys.argv
    EXTENDED = "--extended" in sys.argv
    pins = _load_pins()

    import dynode_tpu

    cache_dir = dynode_tpu.enable_compilation_cache()
    _note(f"compilation cache: {cache_dir or 'disabled'}")

    cfg, base, y0 = _setup()

    backend = jax.default_backend()
    if backend not in ("tpu",):
        print(
            f"[bench] WARNING: no TPU backend available (got {backend}); "
            "measuring the CPU fallback path",
            file=sys.stderr,
        )

    # pinned CPU baseline up front (denominators for every emission);
    # a missing pins file falls back to an in-run measurement so
    # vs_baseline can never silently report 0.0
    cpu_const_tps = float(pins.get("cpu_constant_tps_256", 0.0))
    cpu_adapt_tps = float(pins.get("cpu_adaptive_tps_256", 0.0))
    baseline_source = "pinned" if cpu_const_tps else "missing"
    if not cpu_const_tps:
        try:
            cpu_const_tps = bench_cpu_constant(base, y0, CPU_ENSEMBLE)
            cpu_adapt_tps = bench_cpu_adaptive(cfg, base, y0, CPU_ENSEMBLE)
            baseline_source = "measured"
            _note(
                f"no pinned CPU baseline; measured in-run: "
                f"{cpu_const_tps:,.0f} const / {cpu_adapt_tps:,.0f} "
                "adaptive traj/s (pin these in bench_pins.json)"
            )
        except Exception as e:
            print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)

    result = {
        "metric": "multistrain_seirs_trajectories_per_sec",
        "value": 0.0,
        "unit": "traj/s",
        "vs_baseline": 0.0,
        "baseline_source": baseline_source,
        "roofline": {},
    }
    cand_const = {}   # name -> (tps, width)
    cand_adapt = {}   # name -> tps

    def _refresh():
        if cand_const:
            best = max(cand_const, key=lambda k: cand_const[k][0])
            tps_best, width = cand_const[best]
            result["value"] = result["traj_per_sec"] = round(tps_best, 1)
            result["ensemble_width"] = width
            result["best_path"] = best
            if cpu_const_tps:
                result["vs_baseline"] = round(tps_best / cpu_const_tps, 2)
        if cand_adapt:
            adapt_best = max(cand_adapt.values())
            result["traj_per_sec_adaptive"] = round(adapt_best, 1)
            if cpu_adapt_tps:
                result["vs_baseline_adaptive_same_program"] = round(
                    adapt_best / cpu_adapt_tps, 2
                )

    # ---- stage 1: core 10k rows (always) --------------------------------
    pallas_tps = bench_pallas(base, y0, ENSEMBLE)
    cand_const["pallas_multistrain"] = (pallas_tps, ENSEMBLE)
    _note(
        f"pallas whole-solve kernel: {pallas_tps:,.0f} traj/s "
        f"({ENSEMBLE} x {DURATION:.0f}d, dt={DT})"
    )
    result["value_at_10k"] = round(pallas_tps, 1)
    try:
        lead_tps, cold_compile_s, lead_roof = bench_batch_leading_xla(
            base, y0, ENSEMBLE
        )
        cand_const["batch_leading"] = (lead_tps, ENSEMBLE)
        result["value_at_10k"] = round(max(pallas_tps, lead_tps), 1)
        result["cold_compile_s"] = round(cold_compile_s, 1)
        _note(
            f"batch-leading jit(vmap): {lead_tps:,.0f} traj/s "
            f"(cold compile {cold_compile_s:.1f}s)"
        )
    except Exception as e:
        print(f"[bench] batch-leading XLA path failed: {e}", file=sys.stderr)
    _refresh()
    _emit(result)

    # ---- stage 2: max-width observable-saves kernel rows (headline) -----
    import dynode_tpu.ops.multistrain_pallas as _mp

    rhs_flops = 0.0
    try:
        contact = tuple(
            tuple(float(v) for v in row)
            for row in jnp.asarray(base.contact_matrix).tolist()
        )
        K = _mp.K_DIM

        def _rhs(y, p, t):
            return _mp._rhs_rows(
                y, contact, p[:K], p[K:2 * K], p[2 * K:3 * K],
                p[3 * K:4 * K], _mp.A_DIM, K,
            )

        rhs_flops = _rows_rhs_flops_per_member(
            _rhs, _mp._d_rows(_mp.A_DIM, K), 4 * K
        )
        _note(f"multistrain rows-RHS: {rhs_flops:.0f} flops/member/eval")
    except Exception as e:
        print(f"[bench] rhs flop count failed: {e}", file=sys.stderr)

    n_steps = int(round(DURATION / DT))
    # kernel rows save DAILY (save_every=1.0 default), not per step:
    # 201 saves over 200 days incl t=0. Round-5 review caught the save-DMA
    # bytes being computed from n_steps+1 (401) -- a 2x inflation of every
    # kernel save_dma_gbps/hbm_utilization_saves in that session's logs.
    n_saves = int(round(DURATION / 1.0)) + 1
    if _have(300, "generic_kernel_obs_max"):
        try:
            generic_obs_tps = bench_generic_kernel(
                base, y0, OBS_WIDE_ENSEMBLE, name="generic_kernel_obs_max",
                save_rows="c", save_dtype=jnp.bfloat16,
            )
            cand_const["generic_kernel_obs_max"] = (
                generic_obs_tps, OBS_WIDE_ENSEMBLE
            )
            result["traj_per_sec_generic_kernel_obs_saves"] = round(
                generic_obs_tps, 1
            )
            if rhs_flops:
                result["roofline"]["generic_kernel_obs_max"] = {
                    **_kernel_roofline_const(
                        "generic_kernel_obs_max", OBS_WIDE_ENSEMBLE,
                        6 * n_steps, rhs_flops,
                        n_saves * 8 * OBS_WIDE_ENSEMBLE * 2,  # bf16, 8 pad rows
                    ),
                    "bound_by": "VPU: state resident in VMEM, HBM = the "
                    "8-row bf16 save grid only; see ops doc",
                }
            _note(
                f"generic kernel, observable-only bf16 saves "
                f"(save_rows=c, {OBS_WIDE_ENSEMBLE}): "
                f"{generic_obs_tps:,.0f} traj/s "
                f"(roofline {result['roofline'].get('generic_kernel_obs_max')})"
            )
        except Exception as e:
            print(f"[bench] generic obs-save kernel path failed: {e}",
                  file=sys.stderr)
        _refresh()
        _emit(result)

    if _have(300, "generic_adaptive_obs_max"):
        try:
            gen_adapt_obs_tps, obs_rel, obs_info = bench_generic_adaptive(
                base, y0, OBS_WIDE_ENSEMBLE, name="generic_adaptive_obs_max",
                save_rows="c",
            )
            cand_adapt["generic_adaptive_obs_max"] = gen_adapt_obs_tps
            result["traj_per_sec_generic_adaptive_obs_saves"] = round(
                gen_adapt_obs_tps, 1
            )
            result["generic_adaptive_gate_rel_err"] = round(obs_rel, 6)
            if rhs_flops and obs_info["attempts_total"]:
                wall = statistics.median(WALLS["generic_adaptive_obs_max"])
                # 4 RHS evals per BS3 attempt, dt lockstep per lane block
                tflops = (
                    obs_info["attempts_total"] * 4 * rhs_flops
                    * obs_info["block_b"] / wall / 1e12
                )
                result["roofline"]["generic_adaptive_obs_max"] = {
                    "achieved_tflops": round(tflops, 3),
                    "vpu_utilization_est": round(
                        tflops / VPU_F32_TFLOPS_EST, 4
                    ),
                    "save_dma_gbps": round(
                        n_saves * 8 * OBS_WIDE_ENSEMBLE * 2 / wall / 1e9, 2
                    ),
                    "bound_by": "VPU: ~1 accepted lockstep BS3 step/day "
                    "(4 evals + block-max norm each), error-controlled",
                }
            _note(
                f"generic ADAPTIVE kernel, obs-only bf16 saves "
                f"(save_rows=c, {OBS_WIDE_ENSEMBLE}): "
                f"{gen_adapt_obs_tps:,.0f} traj/s (gate rel {obs_rel:.2e}; "
                f"roofline {result['roofline'].get('generic_adaptive_obs_max')})"
            )
        except Exception as e:
            print(f"[bench] generic adaptive obs-save path failed: {e}",
                  file=sys.stderr)
        _refresh()
        _emit(result)

    # ---- stage 3: ESS/s (TPU-side ChEES; matched quality runs later -----
    # because its CPU-side NUTS is hostage to host core count/load) -------
    nuts_model = None
    if not SMALL and _have(300, "ess_per_sec (ChEES)"):
        try:
            import numpy as np

            import bench_nuts

            nuts_model, obs, true_scales = bench_nuts._make_workload()
            ess_per_sec, chees_post = bench_nuts.bench_chees(nuts_model, obs)
            drift = float(
                np.max(np.abs(chees_post - np.asarray(true_scales)))
            )
            if drift > 0.05:
                _note(f"ChEES posterior drift {drift:.3f}; voiding ESS/s")
                ess_per_sec = 0.0
            result["ess_per_sec"] = round(ess_per_sec, 1)
        except Exception as e:
            print(f"[bench] ESS measurement failed: {e}", file=sys.stderr)
        _emit(result)

    # ---- stage 4: production SEIP model rows ----------------------------
    if not SMALL and _have(360, "SEIP kernel rows"):
        try:
            _bench_seip_rows(result)
        except Exception as e:
            print(f"[bench] SEIP rows failed: {e}", file=sys.stderr)
        _emit(result)

    # ---- stage 5: one-shot latency (the reference user's entry path) ----
    # The child subprocess is a second tunnel client, but the parent is
    # QUIESCENT while it runs (blocked in subprocess.run, no in-flight
    # compiles/execs) -- the round-4 two-client stall involved two
    # *actively compiling* clients; this shape ran clean repeatedly in
    # round-5 validation. Each run's timeout is clamped to the remaining
    # soft window so a cold-cache compile cannot drag the bench past the
    # driver's hard deadline mid-row.
    if not SMALL and _have(360, "oneshot fresh-process wall"):
        try:
            import subprocess

            walls = []
            for i in range(2):
                budget = 600.0
                if not EXTENDED:
                    budget = min(600.0, DEADLINE_S - _elapsed() - 90.0)
                if budget < 60.0:
                    _note("oneshot: window exhausted; keeping partial row")
                    break
                t0 = time.perf_counter()
                proc = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "bench_nuts.py"),
                     "--oneshot"],
                    capture_output=True, text=True, timeout=budget,
                )
                walls.append(time.perf_counter() - t0)
                last = (proc.stdout.strip().splitlines() or ["{}"])[-1]
                gate = json.loads(last)
                if proc.returncode != 0 or not gate.get("oneshot_ok"):
                    raise RuntimeError(
                        f"oneshot run {i} rc={proc.returncode} gate={gate} "
                        f"stderr tail: {proc.stderr[-500:]}"
                    )
            if walls:
                result["oneshot_cold_wall_s"] = round(walls[0], 1)
            if len(walls) > 1:
                result["oneshot_wall_s"] = round(walls[1], 1)
                _note(
                    f"one-shot 1024-chain ChEES fit, fresh process: "
                    f"{walls[1]:.1f}s with warm disk cache "
                    f"(cold {walls[0]:.1f}s) -- includes interpreter+imports"
                )
        except Exception as e:
            print(f"[bench] oneshot row failed: {e}", file=sys.stderr)
        _emit(result)

    # ---- stage 6: matched quality (the only host-CPU-bound headline:
    # last of the headline rows so a slow/loaded host cannot starve the
    # pure-TPU record; ~3 min on the reference-class driver host) ---------
    if nuts_model is not None and _have(300, "matched quality (CPU NUTS)"):
        try:
            mq, mq_tuned, *_ = bench_nuts.bench_matched_quality(
                nuts_model, obs
            )
            result["matched_quality_speedup"] = round(mq, 1)
            result["matched_quality_speedup_tuned_cpu"] = round(mq_tuned, 1)
        except Exception as e:
            print(f"[bench] matched-quality failed: {e}", file=sys.stderr)
        _emit(result)

    # ---- stage 7: secondary rows, cheapest-first within priority --------
    if _have(110, "generic_kernel_max (full rows)"):
        try:
            generic_tps = bench_generic_kernel(
                base, y0, KERNEL_WIDE_ENSEMBLE, name="generic_kernel_max"
            )
            cand_const["generic_kernel_max"] = (
                generic_tps, KERNEL_WIDE_ENSEMBLE
            )
            result["traj_per_sec_generic_kernel"] = round(generic_tps, 1)
            if rhs_flops:
                result["roofline"]["generic_kernel_max"] = {
                    **_kernel_roofline_const(
                        "generic_kernel_max", KERNEL_WIDE_ENSEMBLE,
                        6 * n_steps, rhs_flops,
                        n_saves * _mp._d_rows(_mp.A_DIM, _mp.K_DIM)
                        * KERNEL_WIDE_ENSEMBLE * 4,
                    ),
                    "bound_by": "VPU + full-rows f32 save DMAs",
                }
            _note(
                f"generic rows-RHS kernel, fused pack+solve "
                f"({KERNEL_WIDE_ENSEMBLE}): {generic_tps:,.0f} traj/s "
                f"(roofline {result['roofline'].get('generic_kernel_max')})"
            )
            _refresh()
            _emit(result)
        except Exception as e:
            print(f"[bench] generic kernel path failed: {e}", file=sys.stderr)

    if _have(130, "generic_adaptive_max (full rows)"):
        try:
            gen_adapt_tps, gen_adapt_rel, _info = bench_generic_adaptive(
                base, y0, KERNEL_WIDE_ENSEMBLE
            )
            cand_adapt["generic_adaptive"] = gen_adapt_tps
            result["traj_per_sec_generic_adaptive"] = round(gen_adapt_tps, 1)
            result.setdefault(
                "generic_adaptive_gate_rel_err", round(gen_adapt_rel, 6)
            )
            _note(
                f"generic ADAPTIVE kernel (lockstep BS3, rtol=1e-4, bf16 "
                f"saves, {KERNEL_WIDE_ENSEMBLE}): {gen_adapt_tps:,.0f} "
                f"traj/s (gate rel {gen_adapt_rel:.2e})"
            )
            _refresh()
            _emit(result)
        except Exception as e:
            print(f"[bench] generic adaptive path failed: {e}",
                  file=sys.stderr)

    if _have(90, "pallas_multistrain_max"):
        try:
            pallas_max_tps = bench_pallas(
                base, y0, KERNEL_WIDE_ENSEMBLE, name="pallas_multistrain_max"
            )
            cand_const["pallas_multistrain_max"] = (
                pallas_max_tps, KERNEL_WIDE_ENSEMBLE
            )
            result["traj_per_sec_pallas_max"] = round(pallas_max_tps, 1)
            _note(
                f"pallas kernel at kernel-saturating width "
                f"({KERNEL_WIDE_ENSEMBLE}): {pallas_max_tps:,.0f} traj/s"
            )
            _refresh()
            _emit(result)
        except Exception as e:
            print(f"[bench] kernel-saturating pallas path failed: {e}",
                  file=sys.stderr)

    if _have(110, "batch_leading_wide"):
        try:
            wide_tps, wide_cold, wide_roof = bench_batch_leading_xla(
                base, y0, WIDE_ENSEMBLE, name="batch_leading_wide"
            )
            cand_const["batch_leading_wide"] = (wide_tps, WIDE_ENSEMBLE)
            result["roofline"]["batch_leading_wide"] = {
                **wide_roof,
                "bound_by": "HBM: per-step state streams through HBM",
            }
            result["cold_compile_s"] = round(wide_cold, 1)
            _note(
                f"batch-leading at saturating width ({WIDE_ENSEMBLE}): "
                f"{wide_tps:,.0f} traj/s (cold compile {wide_cold:.1f}s; "
                f"roofline {wide_roof})"
            )
            _refresh()
            _emit(result)
        except Exception as e:
            print(f"[bench] wide-ensemble path failed: {e}", file=sys.stderr)

    if _have(90, "lane_adaptive (XLA save-grid engine)"):
        try:
            lane_adapt_tps = bench_lane_adaptive(cfg, base, y0, WIDE_ENSEMBLE)
            cand_adapt["lane_adaptive"] = lane_adapt_tps
            result["traj_per_sec_adaptive_xla"] = round(lane_adapt_tps, 1)
            _note(
                f"adaptive lane-major (shared dt chain, {WIDE_ENSEMBLE}): "
                f"{lane_adapt_tps:,.0f} traj/s"
            )
            _refresh()
            _emit(result)
        except Exception as e:
            print(f"[bench] adaptive lane-major path failed: {e}",
                  file=sys.stderr)

    if _have(60, "xla_adaptive_vmap"):
        try:
            xla_tps = bench_xla_adaptive(cfg, base, y0, ENSEMBLE)
            cand_adapt["xla_adaptive_vmap"] = xla_tps
            _note(f"xla adaptive per-member vmap: {xla_tps:,.0f} traj/s")
            _refresh()
            _emit(result)
        except Exception as e:
            print(f"[bench] xla adaptive path failed: {e}", file=sys.stderr)

    if _have(60, "lane_major_xla"):
        try:
            lane_tps = bench_lane_major_xla(base, y0, ENSEMBLE)
            cand_const["lane_major_xla"] = (lane_tps, ENSEMBLE)
            _note(f"lane-major XLA direct-save: {lane_tps:,.0f} traj/s")
            _refresh()
            _emit(result)
        except Exception as e:
            print(f"[bench] lane-major XLA path failed: {e}", file=sys.stderr)

    # measured once on TPU: 498s total on a loaded host (cold 315s incl
    # trace + warm 131s at 50,144 ESS/s); budget the loaded-host case
    if nuts_model is not None and _have(500, "ess_per_sec_amortized"):
        try:
            import numpy as np

            amort_ess, amort_post = bench_nuts.bench_chees(
                nuts_model, obs, num_samples=1600
            )
            drift = float(
                np.max(np.abs(amort_post - np.asarray(true_scales)))
            )
            if drift > 0.05:
                _note(f"amortized ChEES drift {drift:.3f}; voiding row")
                amort_ess = 0.0
            result["ess_per_sec_amortized"] = round(amort_ess, 1)
            _note(
                f"ChEES amortized draws (4096 x (200+1600)): "
                f"{amort_ess:,.0f} ESS/s"
            )
            _emit(result)
        except Exception as e:
            print(f"[bench] amortized ESS row failed: {e}", file=sys.stderr)

    if nuts_model is not None and _have(300, "matched_quality_amortized"):
        try:
            mqa, *_ = bench_nuts.bench_matched_quality_amortized(
                nuts_model, obs
            )
            result["matched_quality_speedup_tuned_cpu_amortized"] = round(
                mqa, 1
            )
            _emit(result)
        except Exception as e:
            print(f"[bench] amortized matched-quality failed: {e}",
                  file=sys.stderr)

    if nuts_model is not None and _have(180, "SVI row"):
        try:
            svi_steps_s, _, _, svi_err, _ = bench_nuts.bench_svi(
                nuts_model, obs, true_scales
            )
            if svi_err > 0.05:
                _note(f"SVI posterior err {svi_err:.3f} > 0.05; voiding row")
                svi_steps_s = 0.0
            result["svi_elbo_steps_per_sec"] = round(svi_steps_s, 1)
            result["svi_posterior_max_err"] = round(svi_err, 4)
            _emit(result)
        except Exception as e:
            print(f"[bench] SVI measurement failed: {e}", file=sys.stderr)

    # ---- optional CPU re-measure (updates pins deliberately) ------------
    if remeasure:
        try:
            measured_const = bench_cpu_constant(base, y0, CPU_ENSEMBLE)
            measured_adapt = bench_cpu_adaptive(cfg, base, y0, CPU_ENSEMBLE)
            _note(
                f"CPU re-measured: constant {measured_const:,.0f} adaptive "
                f"{measured_adapt:,.0f} traj/s (pinned: "
                f"{cpu_const_tps:,.0f} / {cpu_adapt_tps:,.0f}) -- update "
                f"{PINS_PATH} deliberately if the host changed"
            )
        except Exception as e:
            print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)

    # ---- regression gate vs prior-round medians + final emission --------
    prior = pins.get("prior_medians", {})
    regressions = []
    for k, prev in prior.items():
        cur = result.get(k, 0.0)
        if prev and cur and cur < 0.7 * prev:
            regressions.append({"metric": k, "prior": prev, "current": cur})
            _note(
                f"REGRESSION: {k} = {cur:,.1f} < 0.7x prior median "
                f"{prev:,.1f}"
            )
        elif prev and cur:
            _note(f"vs prior {k}: {cur:,.1f} / {prev:,.1f} "
                  f"({cur / prev:.2f}x)")
        elif prev:
            _note(f"vs prior {k}: row not measured this run "
                  f"(prior {prev:,.1f})")
    budget = float(pins.get("cold_compile_budget_s", 0.0))
    cold_compile_s = float(result.get("cold_compile_s", 0.0))
    if budget and cold_compile_s > budget:
        regressions.append(
            {"metric": "cold_compile_s", "prior": budget,
             "current": cold_compile_s}
        )
        _note(
            f"REGRESSION: cold compile {cold_compile_s:.1f}s exceeds "
            f"pinned budget {budget:.1f}s"
        )
    result["regressions"] = regressions
    _refresh()
    _emit(result)


def _bench_seip_rows(result):
    """Production SEIP model rows (round-3/4 VMEM kernel headline).

    The 640-float-state SEIP model is HBM-bound on the XLA path (knee at
    ~4k members); the whole-solve-in-VMEM Pallas kernel keeps scaling.
    Gates on member-for-member equivalence at B=1024 before reporting.
    Writes seip_* keys and roofline entries into ``result``.
    """
    import numpy as np

    from dynode_tpu.models.seip import (
        seip_config,
        seip_initial_state,
        seip_ode,
        seip_odeparams,
    )
    from dynode_tpu.ops.seip_pallas import (
        seip_ensemble_solve,
        seip_ensemble_solve_adaptive,
    )

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

    def seip_kernel(n, seed, packed=True):
        # bf16 saves halve the HBM output buffer (the kernel's width
        # bound) AND its DMA traffic (state math stays exact f32 in
        # VMEM; probes/probe_seip_bf16_width.py). The TIMED form uses
        # packed=True, matching the adaptive row: the member-relayout
        # copy is a harness artifact, not solve work (round 4) -- the
        # gate below still checks the unpacked member-last values.
        outs = seip_ensemble_solve(
            seip_y0, seip_base, seip_scales(n, seed),
            duration=200, dt=0.5, save=(3,), save_dtype=jnp.bfloat16,
            packed=packed,
        )
        return outs[0] if packed else outs[0].astype(jnp.float32)

    # equivalence gate at B=1024 (kernel RK4 + bf16-rounded saves vs
    # XLA Tsit5 f32, same scales; bf16's ~4e-3 grid << the 2e-2 gate);
    # unpacked member-last layout so the member axes line up
    kc = np.asarray(jax.device_get(seip_kernel(1024, 0, packed=False)))[-1]
    xc = np.moveaxis(
        np.asarray(jax.device_get(seip_lead(seip_scales(1024, 0))))[:, -1],
        0, -1,
    )
    mdiff = float(np.max(np.abs(kc - xc) / np.maximum(np.abs(xc), 1.0)))
    if mdiff > 2e-2:
        raise RuntimeError(f"kernel equivalence failed ({mdiff:.2e})")
    d1k = seip_scales(1024, 0)
    seip_compiled = seip_lead.lower(d1k).compile()
    seip_xla_tps = _timed_median(
        "seip_xla_1k", lambda s: seip_lead(seip_scales(1024, s)), 1024,
        repeats=3,
    )
    seip_roof = _roofline(
        seip_compiled, statistics.median(WALLS["seip_xla_1k"])
    )
    result["seip_traj_per_sec_xla_1k"] = round(seip_xla_tps, 1)
    result["roofline"]["seip_xla_1k"] = {
        **seip_roof,
        "bound_by": "HBM: 640-float state x 6 stage evals x 400 steps "
        "round-trips HBM every stage",
    }
    _sync(seip_kernel(32768, 1))  # compile at headline width
    seip_tps = _timed_median(
        "seip_kernel_32k", lambda s: seip_kernel(32768, s), 32768,
        repeats=3,
    )
    # the kernel's HBM traffic is by construction the save grid alone
    # (state lives in VMEM): analytic save-DMA bandwidth
    n_saves = 201  # daily saves over 200 days, t=0 included
    c_elems = int(jnp.asarray(seip_y0[3]).size)
    save_bytes = 32768 * n_saves * c_elems * 2  # bf16
    seip_kernel_save_gbps = (
        save_bytes / statistics.median(WALLS["seip_kernel_32k"]) / 1e9
    )
    result["seip_traj_per_sec"] = round(seip_tps, 1)
    result["roofline"]["seip_kernel_32k"] = {
        "achieved_save_dma_gbps": round(seip_kernel_save_gbps, 2),
        "bound_by": "VMEM capacity (output save buffer sets max width) + "
        "VPU: state never touches HBM",
    }
    _note(
        f"SEIP VMEM kernel (B=32768, bf16 C-only saves): {seip_tps:,.0f} "
        f"traj/s (equivalence {mdiff:.2e}; save-DMA "
        f"{seip_kernel_save_gbps:.1f} GB/s; XLA batch-leading at 1024: "
        f"{seip_xla_tps:,.0f}, roofline {seip_roof})"
    )

    # adaptive lockstep kernel (round 4): the reference's DEFAULT solve
    # mode, in-kernel (BS3(2), dt shared per 1024-member block)
    def seip_kernel_adaptive(n, seed):
        outs, stats = seip_ensemble_solve_adaptive(
            seip_y0, seip_base, seip_scales(n, seed),
            duration=200, rtol=1e-4, atol=1e-3, save=(3,),
            save_dtype=jnp.bfloat16, packed=True,
        )
        return outs[0], stats

    # gate: tolerance-level agreement with the (already-gated)
    # constant-step kernel at B=1024, plus zero exhausted intervals
    ka, st = seip_kernel_adaptive(1024, 0)
    kc2 = seip_ensemble_solve(
        seip_y0, seip_base, seip_scales(1024, 0),
        duration=200, dt=0.5, save=(3,), save_dtype=jnp.bfloat16,
        packed=True,
    )[0]
    bad = int(np.asarray(st["exhausted_intervals"]).sum())
    anum = float(jnp.max(jnp.abs(
        ka.astype(jnp.float32) - kc2.astype(jnp.float32)
    )))
    aden = float(jnp.max(jnp.abs(kc2.astype(jnp.float32))))
    adiff = anum / aden
    if adiff > 2e-2 or bad:
        raise RuntimeError(
            f"adaptive gate failed (rel {adiff:.2e}, exhausted {bad})"
        )
    _sync(seip_kernel_adaptive(32768, 1)[0])
    seip_adaptive_tps = _timed_median(
        "seip_kernel_adaptive_32k",
        lambda s: seip_kernel_adaptive(32768, s)[0], 32768, repeats=3,
    )
    seip_adaptive_save_gbps = (
        save_bytes
        / statistics.median(WALLS["seip_kernel_adaptive_32k"]) / 1e9
    )
    result["seip_traj_per_sec_adaptive_kernel"] = round(seip_adaptive_tps, 1)
    result["roofline"]["seip_kernel_adaptive_32k"] = {
        "achieved_save_dma_gbps": round(seip_adaptive_save_gbps, 2),
        "bound_by": "VPU: ~1.2 accepted BS3 steps/day (4 RHS evals + "
        "error norm each) all VMEM-resident; HBM = save grid",
    }
    _note(
        f"SEIP ADAPTIVE kernel (lockstep BS3, rtol=1e-4, B=32768, bf16 "
        f"C-only saves): {seip_adaptive_tps:,.0f} traj/s (gate rel "
        f"{adiff:.2e} vs const kernel; save-DMA "
        f"{seip_adaptive_save_gbps:.1f} GB/s)"
    )


if __name__ == "__main__":
    main()
