"""Secondary benchmark: production SEIP ensemble throughput on TPU.

The heavyweight tensor model (age x immune-history x vaccination x waning x
strain; 640-element state) measured in three configurations -- lane-major
(batch-LAST) with the scatter-free pad-based RHS (the default), the
preserved ``.at[].add`` scatter form, and batch-leading jit(vmap) -- with
the best reported. Constant-step direct-save execution: only the
cumulative-incidence compartment is materialized. Timing ends with a host
fetch (remote-tunnel block_until_ready is unreliable) and uses fresh
draws per repeat.

Roofline history (v5e-1, B=1024): the round-2 scatter-form RHS measured
~5.5-5.8k traj/s in both layouts -- ~60us per ensemble RHS eval, 3-4x
above the ~10-20us HBM floor for moving the 640*B f32 state. The gap WAS
the scatter lowering: rewriting every ``.at[slice].add`` flow increment as
a zero-padded full-shape add (seip_ode / seip_ode_ensemble) reaches
13.3k traj/s lane-major and 15.1k batch-leading -- within ~1.5x of the
bandwidth bound, no Pallas kernel required. The scatter form is kept and
measured so a regression in XLA's scatter lowering (or in our pads) shows
up here.
"""

import json
import math
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
# XLA path is HBM-bound, so its width saturation comes early: 15.1k traj/s
# at B=1024 -> 19.5k at 2048 -> ~14-20k at 4096 (v5e-1, batch-leading,
# tunnel-weather variance ~30%)
WIDE_ENSEMBLE = 4096
# The VMEM kernel's only HBM traffic is the save grid, so it keeps scaling
# far past the XLA knee: 54.6k @4096 -> 72k @8192 -> 122k @16384 -> 156k
# @32768 (C-only saves; the output buffer ~6.7 GB bounds further width)
KERNEL_WIDE = 32768


def _sync_finite(out):
    """Fetch-sync AND validate: a non-finite total (NaN *or* inf -- an
    overflowing solve saturates to inf before it NaNs) means the solve
    produced garbage and the timing is void."""
    total = float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    if not math.isfinite(total):
        raise RuntimeError("solve produced non-finite output")
    return total


def _time(run, repeats=3):
    t0 = time.perf_counter()
    _sync_finite(run(0))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for rep in range(repeats):
        t0 = time.perf_counter()
        _sync_finite(run(rep + 1))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def build_seip_lane_potential(cfg, base, y0, obs, fit_days=100):
    """Chain-batched SEIP potential with the chain axis lane-major
    (batch-LAST) through the solve — ``ChEES(batched_potential_fn=)``.

    Round-2 measured no win for this on the SMALL multistrain model (the
    generic vmap was already good); SEIP is the HBM-bound regime where the
    lane-major FORWARD layout measured ~45x faster than batch-leading
    vmap (models/seip.py note), so the same trick was tried on the
    gradient path of the production fit. MEASURED RESULT (round 4, v5e-1):
    wall-NEUTRAL — warm 129.9s vs the generic path's 133.7s at 1024
    chains x (100+100), identical posterior (max err 0.007). The
    fit's cost is reverse-mode residual traffic through the checkpointed
    scan, which is layout-symmetric; the forward-layout advantage does not
    transfer to gradients. Kept as a measurable row so the conclusion can
    be re-checked when the AD path changes. Identical posterior to
    bench_seip_fit's generic model: same prior, transform/ldj, and
    centered Poisson likelihood.
    """
    import dynode_tpu.dist as dist
    from dynode_tpu.dist.transforms import biject_to

    sp = cfg.parameters.solver_params
    L = base.beta.shape[0]
    prior = dist.TruncatedNormal(
        loc=jnp.ones(L), scale=0.2 * jnp.ones(L), low=0.5, high=1.8
    )
    t = biject_to(prior.support)
    obs_f = jnp.asarray(obs, jnp.result_type(float))
    center = dist.Poisson(jnp.maximum(obs_f, 1e-6)).log_prob(obs_f)

    def batched_pot(zb):  # (C, L) unconstrained -> (C,) potentials
        C = zb.shape[0]
        scales = t(zb)
        lp = prior.log_prob(scales).sum(-1)
        lp += t.log_abs_det_jacobian(zb, scales).sum(-1)
        pb = seip_ensemble_params(base, jnp.ones(C))
        pb = pb.replace(beta=base.beta[:, None] * scales.T)  # (L, C)
        y0b = seip_ensemble_state(y0, C)
        sol = simulate(
            seip_ode_ensemble, fit_days, y0b, pb, sp, sub_save_indices=(3,)
        )
        c = jnp.sum(sol.ys[3], axis=(1, 2, 3))  # (T+1, L, C)
        inc = jnp.maximum(jnp.diff(c, axis=0), 1e-6)
        inc = jnp.moveaxis(inc, -1, 0)  # (C, T, L)
        obs_lp = dist.Poisson(inc).log_prob(obs_f[None]) - center[None]
        return -(lp + obs_lp.sum(axis=(1, 2)))

    return batched_pot


def bench_seip_fit(
    cfg, base, y0, n_chains=1024, fit_days=100, num_warmup=100,
    num_samples=100, lane_major_potential=False,
):
    # NB: fit_days must comfortably exceed the second strain's
    # introduction_time (60 by default) or its transmission scale is
    # unidentified and "recovery" is meaningless.
    """Production-model inference: fit per-strain transmission scales of
    the SEIP model to synthetic Poisson incidence with a ChEES bank.

    The flagship end-to-end path at production tensor rank: every leapfrog
    differentiates through the constant-step SEIP solve (pad-based RHS),
    chains vectorized in one program. Reports min-ESS/s + recovery.
    """
    import dynode_tpu.dist as dist
    from dynode_tpu.infer import MCMC, ChEES, handlers
    from dynode_tpu.infer.diagnostics import effective_sample_size

    sp = cfg.parameters.solver_params
    L = base.beta.shape[0]

    def forward(scales):
        p = base.replace(beta=base.beta * scales)
        sol = simulate(
            seip_ode, fit_days, y0, p, sp, sub_save_indices=(3,)
        )
        return jnp.sum(sol.ys[3], axis=(1, 2, 3))  # (T+1, A) incidence basis

    true_scales = jnp.linspace(1.1, 0.9, L)
    curve = forward(true_scales)
    obs = jax.random.poisson(
        jax.random.PRNGKey(0), jnp.maximum(jnp.diff(curve, axis=0), 1e-6)
    )

    def model(obs_data=None):
        scales = handlers.sample(
            "beta_scales",
            dist.TruncatedNormal(
                loc=jnp.ones(L), scale=0.2 * jnp.ones(L), low=0.5, high=1.8
            ),
        )
        inc = jnp.maximum(jnp.diff(forward(scales), axis=0), 1e-6)
        handlers.sample("obs", dist.Poisson(inc), obs=obs_data)

    batched = (
        build_seip_lane_potential(cfg, base, y0, obs, fit_days=fit_days)
        if lane_major_potential
        else None
    )
    mcmc = MCMC(
        ChEES(model, max_num_steps=64, batched_potential_fn=batched),
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=n_chains,
        steps_per_call=25,
        progress_bar=False,
    )
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(2), obs_data=obs)
    cold_wall = time.perf_counter() - t0
    # warm: the executable cache (infer/mcmc.py) reuses the traced phase
    # programs, so every subsequent fit in a session pays compute only
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(3), obs_data=obs)
    wall = time.perf_counter() - t0
    arr = jnp.asarray(mcmc.get_samples(group_by_chain=True)["beta_scales"])
    import numpy as np

    arr = np.asarray(arr)
    ess = min(
        effective_sample_size(arr[:, :, k]) for k in range(arr.shape[-1])
    )
    post = arr.reshape(-1, L).mean(axis=0)
    err = float(np.max(np.abs(post - np.asarray(true_scales))))
    layout = "lane-major potential" if lane_major_potential else "generic vmap"
    print(
        f"[bench_seip] ChEES fit ({layout}): {n_chains} chains x "
        f"({num_warmup}+{num_samples}) through the {fit_days}d SEIP solve "
        f"warm {wall:.1f}s (cold {cold_wall:.1f}s incl trace+compile); "
        f"min ESS {ess:.0f} -> {ess / wall:.0f} ESS/s; posterior "
        f"{np.round(post, 3)} (true {np.round(np.asarray(true_scales), 3)}, "
        f"max err {err:.3f})",
        file=sys.stderr,
    )
    return ess / wall, err


def main():
    cfg = seip_config(
        seasonal_vaccination=True,
        solver_params=SolverParams(constant_step_size=0.5),
    )
    base = seip_odeparams(cfg)
    y0 = seip_initial_state(cfg)
    y0b = seip_ensemble_state(y0, ENSEMBLE)

    def draws_n(seed, n):
        return jax.random.uniform(
            jax.random.PRNGKey(seed), (n,), minval=0.85, maxval=1.2
        )

    def draws(seed):
        return draws_n(seed, ENSEMBLE)

    def run_lane(seed):
        sol = simulate(
            seip_ode_ensemble, DURATION, y0b,
            seip_ensemble_params(base, draws(seed)),
            cfg.parameters.solver_params,
            sub_save_indices=(3,),
        )
        return sol.ys[3]

    def run_scatter(seed):
        # original .at[].add slice-update form, kept to track XLA's scatter
        # lowering cost (the pad-based default measured 2.4x faster)
        from dynode_tpu.models.seip import seip_ode_ensemble_scatter

        sol = simulate(
            seip_ode_ensemble_scatter, DURATION, y0b,
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

    from dynode_tpu.ops.seip_pallas import seip_ensemble_solve

    def run_kernel(seed):
        # whole-solve-in-VMEM Pallas kernel (RK4, same dt); saves only the
        # cumulative-incidence compartment like the XLA rows -- the output
        # buffer is the kernel's only HBM traffic and bounds its width
        return seip_ensemble_solve(
            y0, base, draws(seed), duration=DURATION, dt=0.5, save=(3,)
        )[0]

    # member-for-member equivalence gate: kernel vs the XLA batch-leading
    # Tsit5 solve on the same scales (both f32; tolerance covers RK4-vs-
    # Tsit5 truncation + 200-day growth amplification of f32 noise)
    kernel_ok = False
    try:
        kc = jax.device_get(run_kernel(0))
        xc = jax.device_get(lead_fn(draws(0)))
        import numpy as _np

        kc_l = _np.asarray(kc)[-1]  # (A,J,K,L,B) final day
        xc_l = _np.moveaxis(_np.asarray(xc)[:, -1], 0, -1)
        denom = _np.maximum(_np.abs(xc_l), 1.0)
        mdiff = float(_np.max(_np.abs(kc_l - xc_l) / denom))
        kernel_ok = mdiff < 2e-2
        verdict = "OK" if kernel_ok else "FAILED - kernel row skipped"
        print(
            f"[bench_seip] kernel equivalence vs XLA: max rel diff "
            f"{mdiff:.2e} ({verdict})",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench_seip] kernel equivalence check failed: {e}",
              file=sys.stderr)

    results = {}
    layouts = [
        ("lane-major", run_lane),
        ("lane-major-scatter", run_scatter),
        ("batch-leading", run_lead),
    ]
    if kernel_ok:
        layouts.append(("pallas-vmem-kernel", run_kernel))
    for name, run in layouts:
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
    try:
        def run_wide(seed):
            return lead_fn(
                jax.random.uniform(
                    jax.random.PRNGKey(seed), (WIDE_ENSEMBLE,),
                    minval=0.85, maxval=1.2,
                )
            )

        best, compile_s = _time(run_wide)
        results["batch-leading-wide"] = WIDE_ENSEMBLE / best
        print(
            f"[bench_seip] batch-leading at saturating width "
            f"({WIDE_ENSEMBLE}): {WIDE_ENSEMBLE / best:,.0f} traj/s "
            f"(compile {compile_s:.0f}s)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench_seip] wide path failed: {e}", file=sys.stderr)
    if kernel_ok:
        try:
            def run_kernel_wide(seed):
                scales = jax.random.uniform(
                    jax.random.PRNGKey(seed), (WIDE_ENSEMBLE,),
                    minval=0.85, maxval=1.2,
                )
                return seip_ensemble_solve(
                    y0, base, scales, duration=DURATION, dt=0.5, save=(3,)
                )[0]

            best, compile_s = _time(run_kernel_wide)
            results["pallas-vmem-kernel-wide"] = WIDE_ENSEMBLE / best
            print(
                f"[bench_seip] pallas kernel at {WIDE_ENSEMBLE}: "
                f"{WIDE_ENSEMBLE / best:,.0f} traj/s "
                f"(compile {compile_s:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench_seip] kernel wide path failed: {e}",
                  file=sys.stderr)
        try:
            def run_kernel_max(seed):
                scales = jax.random.uniform(
                    jax.random.PRNGKey(seed), (KERNEL_WIDE,),
                    minval=0.85, maxval=1.2,
                )
                return seip_ensemble_solve(
                    y0, base, scales, duration=DURATION, dt=0.5, save=(3,)
                )[0]

            best, compile_s = _time(run_kernel_max)
            results["pallas-vmem-kernel-max"] = KERNEL_WIDE / best
            print(
                f"[bench_seip] pallas kernel at saturating width "
                f"({KERNEL_WIDE}): {KERNEL_WIDE / best:,.0f} traj/s "
                f"(compile {compile_s:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench_seip] kernel max-width path failed: {e}",
                  file=sys.stderr)
        try:
            # FULL-trajectory production config (VERDICT r3 item 3): every
            # compartment saved daily at max width. Pipelined save DMAs
            # (stage -> start -> deferred wait) plus packed output (no 2x
            # member-relayout copy) keep the 7.9 GiB bf16 buffer inside
            # HBM and the save traffic off the critical path. Criterion:
            # within 25% of C-only throughput at the same width.
            def run_kernel_full4(seed):
                scales = jax.random.uniform(
                    jax.random.PRNGKey(seed), (KERNEL_WIDE,),
                    minval=0.85, maxval=1.2,
                )
                return seip_ensemble_solve(
                    y0, base, scales, duration=DURATION, dt=0.5,
                    save_dtype=jnp.bfloat16, packed=True,
                )

            def _sync_full4(out):
                # fused f32-accumulating reduce: an eager astype(f32) of
                # the 7.9 GiB bf16 buffer would itself OOM
                total = float(
                    sum(jnp.sum(c, dtype=jnp.float32) for c in out)
                )
                if not math.isfinite(total):
                    raise RuntimeError("full-4 solve non-finite")
                return total

            _sync_full4(run_kernel_full4(0))
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                _sync_full4(run_kernel_full4(rep + 1))
                best = min(best, time.perf_counter() - t0)
            results["pallas-vmem-kernel-full4"] = KERNEL_WIDE / best
            c_only = results.get("pallas-vmem-kernel-max", 0.0)
            ratio = (KERNEL_WIDE / best) / c_only if c_only else float("nan")
            print(
                f"[bench_seip] pallas kernel FULL-4 daily bf16 saves at "
                f"{KERNEL_WIDE}: {KERNEL_WIDE / best:,.0f} traj/s "
                f"({ratio:.2f}x the C-only row; criterion >=0.75)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench_seip] kernel full-4 path failed: {e}",
                  file=sys.stderr)

    # ---- adaptive rows (VERDICT r3 item 7) --------------------------------
    # The reference's DEFAULT solve mode is adaptive
    # (/root/reference/src/dynode/config/params.py:36-47); until round 4 the
    # kernel's win existed only under constant-step. Two adaptive paths:
    # the lockstep-dt BS3(2) VMEM kernel (dt shared per 1024-member block,
    # block-max error norm) and the XLA save-grid engine on the lane-major
    # ensemble RHS (ONE shared dt chain across the whole bank). Tolerances
    # rtol=1e-4 / atol=1e-3 (f32-scaled for ~1e3..1e4 populations).
    from dynode_tpu.ops.seip_pallas import seip_ensemble_solve_adaptive

    adaptive_gate_ok = False
    try:
        # gate: adaptive kernel vs constant-step kernel at tight dt, B=1024
        outs_a, stats_a = seip_ensemble_solve_adaptive(
            y0, base, draws_n(0, 1024), duration=DURATION,
            rtol=1e-4, atol=1e-3, save=(3,), packed=True,
        )
        bad = int(jnp.sum(stats_a["exhausted_intervals"]))
        outs_c = seip_ensemble_solve(
            y0, base, draws_n(0, 1024), duration=DURATION, dt=0.05,
            save=(3,), packed=True,
        )
        num = float(jnp.max(jnp.abs(outs_a[0] - outs_c[0])))
        den = float(jnp.max(jnp.abs(outs_c[0])))
        rel = num / den
        adaptive_gate_ok = rel < 1e-2 and bad == 0
        verdict = "OK" if adaptive_gate_ok else "FAILED - adaptive rows skipped"
        print(
            f"[bench_seip] adaptive-kernel gate vs const dt=0.05: max rel "
            f"diff {rel:.2e}, exhausted intervals {bad} ({verdict})",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench_seip] adaptive gate failed: {e}", file=sys.stderr)

    if adaptive_gate_ok:
        try:
            def run_adapt_kernel(seed):
                outs, _ = seip_ensemble_solve_adaptive(
                    y0, base, draws_n(seed, KERNEL_WIDE), duration=DURATION,
                    rtol=1e-4, atol=1e-3, save=(3,), packed=True,
                )
                return outs[0]

            best, compile_s = _time(run_adapt_kernel)
            results["pallas-adaptive-kernel-max"] = KERNEL_WIDE / best
            print(
                f"[bench_seip] ADAPTIVE pallas kernel (lockstep BS3, "
                f"rtol=1e-4) at {KERNEL_WIDE}: {KERNEL_WIDE / best:,.0f} "
                f"traj/s (compile {compile_s:.0f}s)",
                file=sys.stderr,
            )

            # width still pays past 32k for the adaptive kernel (+29%
            # measured 32k -> 65k; blocks run back-to-back at full rate and
            # the C-only bf16 save buffer stays tiny)
            wide2 = 2 * KERNEL_WIDE

            def run_adapt_kernel_wide(seed):
                outs, _ = seip_ensemble_solve_adaptive(
                    y0, base, draws_n(seed, wide2), duration=DURATION,
                    rtol=1e-4, atol=1e-3, save=(3,), packed=True,
                    save_dtype=jnp.bfloat16,
                )
                return outs[0]

            best2, compile2 = _time(run_adapt_kernel_wide)
            results["pallas-adaptive-kernel-max-wide"] = wide2 / best2
            print(
                f"[bench_seip] ADAPTIVE pallas kernel at {wide2} "
                f"(bf16 saves): {wide2 / best2:,.0f} traj/s "
                f"(compile {compile2:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench_seip] adaptive kernel row failed: {e}",
                  file=sys.stderr)
        try:
            sp_adapt = SolverParams(
                ode_solver_rel_tolerance=1e-4,
                ode_solver_abs_tolerance=1e-3,
                steps_per_save=8,
            )
            y0w = seip_ensemble_state(y0, WIDE_ENSEMBLE)

            def run_adapt_xla(seed):
                sol = simulate(
                    seip_ode_ensemble, DURATION, y0w,
                    seip_ensemble_params(
                        base, draws_n(seed, WIDE_ENSEMBLE)
                    ),
                    sp_adapt,
                    sub_save_indices=(3,),
                )
                return sol.ys[3]

            best, compile_s = _time(run_adapt_xla)
            results["xla-adaptive-lane"] = WIDE_ENSEMBLE / best
            print(
                f"[bench_seip] ADAPTIVE XLA save-grid engine (lane-major, "
                f"shared dt) at {WIDE_ENSEMBLE}: "
                f"{WIDE_ENSEMBLE / best:,.0f} traj/s "
                f"(compile {compile_s:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[bench_seip] adaptive XLA row failed: {e}",
                  file=sys.stderr)

    if not results:
        print(
            json.dumps(
                {
                    "metric": "seip_trajectories_per_sec",
                    "value": 0.0,
                    "unit": "traj/s",
                    "vs_baseline": 0.0,
                    "error": "all layout runs failed",
                }
            )
        )
        return
    tps = max(results.values())
    winner = max(results, key=results.get)
    print(
        f"[bench_seip] {ENSEMBLE} x {DURATION}d SEIP (state 640): "
        f"{tps:,.0f} traj/s ({winner})",
        file=sys.stderr,
    )
    fit_ess_s = fit_lane_ess_s = 0.0
    try:
        fit_ess_s, fit_err = bench_seip_fit(cfg, base, y0)
    except Exception as e:
        print(f"[bench_seip] fit benchmark failed: {e}", file=sys.stderr)
    try:
        fit_lane_ess_s, fit_lane_err = bench_seip_fit(
            cfg, base, y0, lane_major_potential=True
        )
        if fit_lane_err > 0.05:
            print(
                f"[bench_seip] lane-major fit posterior err "
                f"{fit_lane_err:.3f} > 0.05; voiding the row",
                file=sys.stderr,
            )
            fit_lane_ess_s = 0.0
    except Exception as e:
        print(f"[bench_seip] lane-major fit benchmark failed: {e}",
              file=sys.stderr)

    full4 = results.get("pallas-vmem-kernel-full4", 0.0)
    c_only = results.get("pallas-vmem-kernel-max", 0.0)
    adapt_k = results.get("pallas-adaptive-kernel-max", 0.0)
    adapt_x = results.get("xla-adaptive-lane", 0.0)
    print(
        json.dumps(
            {
                "metric": "seip_trajectories_per_sec",
                "value": round(tps, 1),
                "unit": "traj/s",
                "vs_baseline": 0.0,
                "chees_fit_ess_per_sec": round(max(fit_ess_s, fit_lane_ess_s), 2),
                "chees_fit_ess_per_sec_generic": round(fit_ess_s, 2),
                "chees_fit_ess_per_sec_lane_major": round(fit_lane_ess_s, 2),
                "full4_traj_per_sec": round(full4, 1),
                "full4_vs_c_only": round(full4 / c_only, 3) if c_only else 0.0,
                "adaptive_kernel_traj_per_sec": round(adapt_k, 1),
                "adaptive_kernel_traj_per_sec_wide": round(
                    results.get("pallas-adaptive-kernel-max-wide", 0.0), 1
                ),
                "adaptive_xla_traj_per_sec": round(adapt_x, 1),
                "adaptive_kernel_vs_xla": (
                    round(adapt_k / adapt_x, 2) if adapt_x else 0.0
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
