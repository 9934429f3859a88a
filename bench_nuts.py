"""Secondary benchmark: NUTS ESS/sec on the multi-strain SEIRS fit (TPU).

BASELINE.json's second headline metric. Fits strain R0 multipliers of the
2-age x 3-strain SEIRS model to synthetic Poisson incidence with 4
vectorized NUTS chains compiled into one program on the TPU chip, then
reports min-across-parameters effective samples per second.

Prints one JSON line like bench.py (kept separate so the driver's bench.py
contract stays single-metric).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import dynode_tpu.dist as dist
from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.infer import MCMC, NUTS, ChEES, handlers
from dynode_tpu.infer.diagnostics import effective_sample_size
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_odeparams,
)

DURATION = 100
NUM_WARMUP = 200
NUM_SAMPLES = 200
NUM_CHAINS = 4096
# In a lockstep vectorized bank every transition costs the MAX leapfrogs
# across all chains, so the wide-bank optimum is SHORT trajectories x MANY
# chains: depth 3 keeps minESS essentially unchanged on this posterior
# (160k @ 1024 chains) while cutting wall 2.8x vs depth 6; depth 2
# collapses ESS (too-short trajectories). Swept in round 2: depth 6 -> 961
# ESS/s, 4 -> 1346, 3 -> 2636, 2 -> 471 (1024 chains, v5e-1).
MAX_TREE_DEPTH = 3
# ChEES headline draws: the chain-width knee is saturated at 4096 (8192 and
# 16384 chains measured FLAT -- wall scales linearly past chip saturation)
# but the warmup floor still amortizes across draws: 4096 x (200+400) gives
# 34.1k ESS/s vs 22.8k at (200+200), with 8192 x (200+400) slightly worse
# (29.8k). Swept in probes/probe_chees_width_sweep.py (round 4).
CHEES_NUM_SAMPLES = 400


def build_model():
    # constant-step direct-save potential: ~8x cheaper gradients than the
    # adaptive path on TPU (no masked no-op iterations, no controller
    # select-chains, minimal HBM traffic)
    cfg = multistrain_config(
        solver_params=SolverParams(constant_step_size=0.5)
    )
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    sp = cfg.parameters.solver_params

    def forward(r0_scales):
        p = base.replace(beta=base.beta * r0_scales)
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        return sol.ys[-1]  # cumulative incidence timeseries (T, A, K)

    def model(obs=None):
        scales = handlers.sample(
            "r0_scales",
            dist.TruncatedNormal(
                loc=jnp.ones(3), scale=0.3 * jnp.ones(3), low=0.5, high=2.0
            ),
        )
        c = forward(scales)
        incidence = jnp.maximum(jnp.diff(c, axis=0), 1e-6)
        handlers.sample("obs_incidence", dist.Poisson(incidence), obs=obs)

    return model, forward


def build_lane_major_potential(obs):
    """Chain-batched potential with the chain axis lane-major (batch-LAST)
    through the ODE solve -- the NUTS(batched_potential_fn=) fast path.

    Identical posterior to build_model()'s generic potential: same priors,
    same transforms/ldj, same Poisson likelihood (centered with the
    saturated log-likelihood, a constant shift).
    """
    from dynode_tpu.dist.transforms import biject_to
    from dynode_tpu.models.multistrain import (
        multistrain_ensemble_state,
        multistrain_ode_ensemble,
    )

    cfg = multistrain_config(
        solver_params=SolverParams(constant_step_size=0.5)
    )
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    sp = cfg.parameters.solver_params
    prior = dist.TruncatedNormal(
        loc=jnp.ones(3), scale=0.3 * jnp.ones(3), low=0.5, high=2.0
    )
    t = biject_to(prior.support)
    obs_f = jnp.asarray(obs, jnp.result_type(float))
    center = dist.Poisson(jnp.maximum(obs_f, 1e-6)).log_prob(obs_f)

    def batched_pot(zb):  # (C, 3) unconstrained -> (C,) potentials
        C = zb.shape[0]
        scales = t(zb)
        lp = prior.log_prob(scales).sum(-1)
        lp += t.log_abs_det_jacobian(zb, scales).sum(-1)
        pb = base.replace(beta=base.beta[:, None] * scales.T)  # (K, C)
        y0b = multistrain_ensemble_state(y0, C)
        sol = simulate(
            multistrain_ode_ensemble, DURATION, y0b, pb, sp,
            sub_save_indices=(4,),
        )
        c = jnp.moveaxis(sol.ys[4], -1, 0)  # (C, T, A, K)
        inc = jnp.maximum(jnp.diff(c, axis=1), 1e-6)
        obs_lp = dist.Poisson(inc).log_prob(obs_f[None]) - center[None]
        return -(lp + obs_lp.sum(axis=(1, 2, 3)))

    return batched_pot


def bench_chees(
    model,
    obs,
    num_chains=NUM_CHAINS,
    num_warmup=NUM_WARMUP,
    num_samples=CHEES_NUM_SAMPLES,
):
    """ChEES-HMC on the same posterior: every chain takes the SAME number
    of leapfrog steps per transition (shared learned trajectory, Halton
    jitter), so the lockstep bank pays the learned MEAN trajectory instead
    of NUTS's per-transition MAX tree (infer/chees.py)."""
    mcmc = MCMC(
        ChEES(model),
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=num_chains,
        progress_bar=False,
        steps_per_call=16,
    )
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(0), obs=obs)
    cold_wall = time.perf_counter() - t0
    # warm = the steady-state cost of every subsequent fit in a session:
    # the cross-run executable cache (infer/mcmc.py) reuses the traced
    # programs, so this run pays device compute only
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(1), obs=obs)
    wall = time.perf_counter() - t0
    arr = np.asarray(
            mcmc.get_samples(group_by_chain=True)["r0_scales"], dtype=np.float64
        )
    ess = min(
        effective_sample_size(arr[:, :, k]) for k in range(arr.shape[-1])
    )
    ef = mcmc.get_extra_fields()
    div = int(np.asarray(ef["diverging"]).sum())
    mean_leapfrogs = float(np.asarray(ef["num_steps"]).mean())
    # stuck = ALL coordinates frozen (matches MCMC._collect)
    stuck = int((arr.std(axis=1).max(axis=-1) < 1e-5).sum())
    post_mean = arr.reshape(-1, 3).mean(axis=0)
    inv_mass, chol, eps, traj = mcmc._tuned
    print(
        f"[bench_nuts] ChEES {num_chains} chains x ({num_warmup}+"
        f"{num_samples}) warm {wall:.1f}s (cold {cold_wall:.1f}s incl "
        f"trace+compile); min ESS {ess:.0f} -> "
        f"{ess / wall:.0f} ESS/s; divergences {div}; mean leapfrogs "
        f"{mean_leapfrogs:.1f}; stuck {stuck}; eps {float(eps):.4f} "
        f"traj {float(traj):.4f}; posterior means {np.round(post_mean, 3)}",
        file=sys.stderr,
    )
    return ess / wall, post_mean


def bench_4chain_vs_cpu(model, obs, num_warmup=100, num_samples=100):
    """BASELINE.md north star: 4-chain NUTS wall-clock, TPU vs CPU, SAME
    program (multi-strain SEIRS, constant-step potential, identical draw
    counts). Each backend is timed COLD (first run, compile included) and
    WARM (second run, jit cache hit -- the steady-state cost of every
    subsequent fit in a session). Returns ((tpu_cold, tpu_warm, ess),
    (cpu_cold, cpu_warm, ess), warm_speedup)."""

    def run_once(seed):
        mcmc = MCMC(
            NUTS(model, dense_mass=True, max_tree_depth=MAX_TREE_DEPTH),
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_chains=4,
            progress_bar=False,
            # divides both phases evenly: 1 warmup + 1 sampling program
            steps_per_call=max(num_warmup, num_samples),
        )
        t0 = time.perf_counter()
        mcmc.run(jax.random.PRNGKey(seed), obs=obs)
        wall = time.perf_counter() - t0
        arr = np.asarray(
            mcmc.get_samples(group_by_chain=True)["r0_scales"], dtype=np.float64
        )
        ess = min(
            effective_sample_size(arr[:, :, k]) for k in range(arr.shape[-1])
        )
        return wall, ess

    def cold_warm(seed):
        cold, ess = run_once(seed)
        warm, _ = run_once(seed + 1)
        return cold, warm, ess

    tpu = cold_warm(11)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cpu_res = cold_warm(11)
    return tpu, cpu_res, cpu_res[1] / tpu[1]


def bench_matched_quality(model, obs, num_warmup=100, num_samples=100):
    """BASELINE.md's north star, closed at MATCHED POSTERIOR QUALITY.

    The literal "4-chain NUTS wall-clock" comparison is latency-bound on
    TPU (4 tiny chains leave the chip idle; measured ~2x). The defensible
    bridge metric: take the min ESS the 4-chain CPU NUTS run actually
    delivers, then measure the TPU wall-clock to reach AT LEAST that min
    ESS with the TPU free to choose its own bank shape (a modest
    1024-chain ChEES bank with a short warmup). Both sides are WARM walls
    (second run, jit-cached -- the steady-state cost of every fit in a
    session).

    TWO CPU baselines are measured, because "CPU reference" in BASELINE.md
    means the reference's own configuration, not this repo's best CPU:

    - **reference-shaped**: the settings a reference user actually runs
      (`/root/reference/examples/sir_infer_parameters.py:92-98` +
      numpyro defaults): 4 chains, 500 warmup + 100 samples,
      max_tree_depth=10, diagonal mass, sequential chains (numpyro's CPU
      fallback when chains > devices). This is the BASELINE.md ratio.
    - **tuned**: this repo's best CPU NUTS (vectorized 4-chain bank,
      dense mass, short trees, 100+100) -- a strictly harder
      baseline, reported alongside so the headline is not resting on a
      de-tuned opponent.

    Returns (speedup_ref, speedup_tuned, cpu walls/ess, tpu wall/ess).
    """

    def _ess_and_mean(mcmc):
        arr = np.asarray(
            mcmc.get_samples(group_by_chain=True)["r0_scales"], dtype=np.float64
        )
        ess = min(
            effective_sample_size(arr[:, :, k]) for k in range(arr.shape[-1])
        )
        return ess, arr.reshape(-1, arr.shape[-1]).mean(axis=0)

    def cpu_ref_once(seed):
        # reference configuration: sequential chains avoid the vectorized
        # bank's max-leapfrog penalty, matching numpyro-on-laptop semantics
        mcmc = MCMC(
            NUTS(model, dense_mass=False, max_tree_depth=10),
            num_warmup=500,
            num_samples=100,
            num_chains=4,
            progress_bar=False,
            chain_method="sequential",
        )
        t0 = time.perf_counter()
        mcmc.run(jax.random.PRNGKey(seed), obs=obs)
        wall = time.perf_counter() - t0
        return (wall,) + _ess_and_mean(mcmc)

    def cpu_tuned_once(seed):
        mcmc = MCMC(
            NUTS(model, dense_mass=True, max_tree_depth=MAX_TREE_DEPTH),
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_chains=4,
            progress_bar=False,
            steps_per_call=max(num_warmup, num_samples),
        )
        t0 = time.perf_counter()
        mcmc.run(jax.random.PRNGKey(seed), obs=obs)
        wall = time.perf_counter() - t0
        return (wall,) + _ess_and_mean(mcmc)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cpu_ref_once(21)  # cold (compile)
        ref_wall, ref_ess, ref_mean = cpu_ref_once(22)  # warm
        cpu_tuned_once(31)  # cold
        cpu_wall, cpu_ess, cpu_mean = cpu_tuned_once(32)  # warm

    # --- TPU side: wide SHORT bank -- 1024 chains x (8 warmup + 8 draws).
    # Monolithic (no steps_per_call) = 2 device dispatches total; the ~16
    # sequential transitions are the irreducible cost.
    #
    # ESS at 8 draws/chain cannot be measured with the autocorrelation
    # estimator (measured artifact: it returns 4% efficiency at 16 draws
    # and the exact chains x draws ceiling at 8 -- too-short series).
    # Instead ESS is measured OPERATIONALLY from cross-chain scatter: the
    # 1024 chains are independent (independent prior inits and rng keys;
    # post-warmup draws are independent across chains given the shared
    # tuned params), so se(bank mean)^2 = var(chain means)/n_chains with
    # ~1k dof, and ESS = posterior_var / se^2. Within-chain
    # autocorrelation inflates var(chain means) and lowers this ESS
    # automatically. A shared warmup-convergence BIAS would not show in
    # cross-chain scatter -- that is exactly what the posterior-mean
    # agreement gate below catches (against both CPU baselines).
    def tpu_once(seed):
        mcmc = MCMC(
            ChEES(model),
            num_warmup=8,
            num_samples=8,
            num_chains=1024,
            progress_bar=False,
        )
        t0 = time.perf_counter()
        mcmc.run(jax.random.PRNGKey(seed), obs=obs)
        wall = time.perf_counter() - t0
        arr = np.asarray(
            mcmc.get_samples(group_by_chain=True)["r0_scales"], dtype=np.float64
        )
        flat = arr.reshape(-1, arr.shape[-1])
        chain_means = arr.mean(axis=1)
        se2 = chain_means.var(axis=0, ddof=1) / arr.shape[0]
        ess = float(np.min(flat.var(axis=0) / np.maximum(se2, 1e-30)))
        return wall, ess, flat.mean(axis=0)

    tpu_once(40)  # cold
    runs = [tpu_once(s) for s in (41, 42, 43)]  # warm
    tpu_wall = float(np.median([r[0] for r in runs]))
    tpu_ess = float(np.median([r[1] for r in runs]))
    tpu_mean = np.mean([r[2] for r in runs], axis=0)
    # matched QUALITY means matched POSTERIOR, not just ESS: a short-warmup
    # bias with high ESS must not count. Means must agree within combined
    # Monte-Carlo error (5 sigma; sem ~ posterior sd / sqrt(min ESS))
    target_ess = max(ref_ess, cpu_ess)
    # agreement against BOTH baselines' means (each has its own MC error)
    drift = max(
        float(np.max(np.abs(tpu_mean - ref_mean))),
        float(np.max(np.abs(tpu_mean - cpu_mean))),
    )
    sem = 0.05 / np.sqrt(
        min(ref_ess, cpu_ess, tpu_ess)
    )  # posterior sd ~0.03-0.05
    if tpu_ess < target_ess or drift > 5.0 * sem + 1e-3:
        print(
            f"[bench_nuts] matched-quality: TPU bank ESS {tpu_ess:.0f} vs "
            f"CPU ESS {target_ess:.0f}, posterior-mean drift {drift:.4f} "
            f"(limit {5.0 * sem + 1e-3:.4f}); ratio not valid",
            file=sys.stderr,
        )
        return 0.0, 0.0, ref_wall, ref_ess, cpu_wall, cpu_ess, tpu_wall, tpu_ess
    speedup_ref = ref_wall / tpu_wall
    speedup_tuned = cpu_wall / tpu_wall
    print(
        f"[bench_nuts] matched-quality north star: reference-shaped CPU "
        f"4-chain NUTS (500+100, depth 10, diag mass, sequential) warm "
        f"{ref_wall:.1f}s -> min ESS {ref_ess:.0f}; tuned-CPU 4-chain bank "
        f"({num_warmup}+{num_samples}, depth {MAX_TREE_DEPTH}, dense mass) "
        f"warm {cpu_wall:.1f}s -> min ESS {cpu_ess:.0f}; TPU 1024-chain "
        f"ChEES (8+8) warm {tpu_wall:.1f}s -> min ESS {tpu_ess:.0f} "
        f"(cross-chain-scatter estimate; >= both) => {speedup_ref:.1f}x vs "
        f"the reference configuration (BASELINE.md target >=50x), "
        f"{speedup_tuned:.1f}x vs this repo's best CPU (the TPU side is "
        f"bound by its ~16 sequential transitions, not by chain width)",
        file=sys.stderr,
    )
    return (
        speedup_ref, speedup_tuned,
        ref_wall, ref_ess, cpu_wall, cpu_ess, tpu_wall, tpu_ess,
    )


def bench_matched_quality_amortized(model, obs, num_samples_cpu=100):
    """Matched quality in the CHAINED-INFERENCE (production) regime.

    Production scenario fits re-run many times in a session (updated data,
    new projections); the reference keeps ``last_state`` for exactly this
    (src/dynode/infer/inference.py:50-53). Here BOTH sides warm-start from
    a previous fit's tuned state (mass matrix, step size, converged
    positions -- ``MCMC.warm_start_state()``), so each re-fit pays
    sampling only:

    - CPU: this repo's best CPU NUTS (4-chain vectorized bank, dense mass,
      depth 3) re-fit = ``num_warmup=0`` + 100 draws/chain.
    - TPU: 1024-chain ChEES re-fit = 2 bank transitions (the 1024
      independent chains deliver ~2k effective draws from 2 transitions --
      the width advantage with the warmup floor amortized away).

    Both walls are warm (jit-cached, median of 3). Validity gates: the TPU
    bank's cross-chain-scatter ESS must be >= the CPU re-fit's
    autocorrelation ESS, and posterior means must agree within combined
    Monte-Carlo error. Returns (speedup, cpu_wall, cpu_ess, tpu_wall,
    tpu_ess).
    """

    def _ess_mean(mcmc):
        arr = np.asarray(
            mcmc.get_samples(group_by_chain=True)["r0_scales"], dtype=np.float64
        )
        ess = min(
            effective_sample_size(arr[:, :, k]) for k in range(arr.shape[-1])
        )
        return ess, arr.reshape(-1, arr.shape[-1]).mean(axis=0)

    # ---- CPU side ----------------------------------------------------------
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        fit0 = MCMC(
            NUTS(model, dense_mass=True, max_tree_depth=MAX_TREE_DEPTH),
            num_warmup=100,
            num_samples=num_samples_cpu,
            num_chains=4,
            progress_bar=False,
            steps_per_call=max(100, num_samples_cpu),
        )
        fit0.run(jax.random.PRNGKey(50), obs=obs)
        cpu_ws = fit0.warm_start_state()
        refit = MCMC(
            NUTS(model, dense_mass=True, max_tree_depth=MAX_TREE_DEPTH),
            num_warmup=0,
            num_samples=num_samples_cpu,
            num_chains=4,
            progress_bar=False,
        )
        refit.run(jax.random.PRNGKey(51), obs=obs, warm_start=cpu_ws)  # cold
        walls = []
        for seed in (52, 53, 54):
            t0 = time.perf_counter()
            refit.run(jax.random.PRNGKey(seed), obs=obs, warm_start=cpu_ws)
            walls.append(time.perf_counter() - t0)
        cpu_wall = float(np.median(walls))
        cpu_ess, cpu_mean = _ess_mean(refit)

    # ---- TPU side ----------------------------------------------------------
    fit0 = MCMC(
        ChEES(model),
        num_warmup=8,
        num_samples=8,
        num_chains=1024,
        progress_bar=False,
    )
    fit0.run(jax.random.PRNGKey(60), obs=obs)
    tpu_ws = fit0.warm_start_state()
    refit_t = MCMC(
        ChEES(model),
        num_warmup=0,
        num_samples=2,
        num_chains=1024,
        progress_bar=False,
    )

    def tpu_once(seed):
        t0 = time.perf_counter()
        refit_t.run(jax.random.PRNGKey(seed), obs=obs, warm_start=tpu_ws)
        wall = time.perf_counter() - t0
        arr = np.asarray(
            refit_t.get_samples(group_by_chain=True)["r0_scales"],
            dtype=np.float64,
        )
        flat = arr.reshape(-1, arr.shape[-1])
        chain_means = arr.mean(axis=1)
        se2 = chain_means.var(axis=0, ddof=1) / arr.shape[0]
        ess = float(np.min(flat.var(axis=0) / np.maximum(se2, 1e-30)))
        return wall, ess, flat.mean(axis=0)

    tpu_once(61)  # cold (compiles the 2-transition sampling program)
    runs = [tpu_once(s) for s in (62, 63, 64)]
    tpu_wall = float(np.median([r[0] for r in runs]))
    tpu_ess = float(np.median([r[1] for r in runs]))
    tpu_mean = np.mean([r[2] for r in runs], axis=0)

    drift = float(np.max(np.abs(tpu_mean - cpu_mean)))
    sem = 0.05 / np.sqrt(min(cpu_ess, tpu_ess))
    if tpu_ess < cpu_ess or drift > 5.0 * sem + 1e-3:
        print(
            f"[bench_nuts] amortized matched-quality: TPU ESS {tpu_ess:.0f} "
            f"vs CPU ESS {cpu_ess:.0f}, drift {drift:.4f} (limit "
            f"{5.0 * sem + 1e-3:.4f}); ratio not valid",
            file=sys.stderr,
        )
        return 0.0, cpu_wall, cpu_ess, tpu_wall, tpu_ess
    speedup = cpu_wall / tpu_wall
    print(
        f"[bench_nuts] amortized matched-quality (chained inference, both "
        f"sides warm-started, sampling only): tuned-CPU 4-chain NUTS re-fit "
        f"{cpu_wall:.2f}s -> min ESS {cpu_ess:.0f}; TPU 1024-chain ChEES "
        f"re-fit (2 transitions) {tpu_wall:.2f}s -> min ESS {tpu_ess:.0f} "
        f"(cross-chain scatter) => {speedup:.1f}x vs this repo's best CPU "
        f"at matched quality (the warmup floor is amortized across the "
        f"session's fits; cold/one-shot fits see the non-amortized row)",
        file=sys.stderr,
    )
    return speedup, cpu_wall, cpu_ess, tpu_wall, tpu_ess


def bench_svi(model, obs, true_scales, num_starts=1024, num_steps=300):
    """TPU-scale SVI row (VERDICT r3 item 5): the vmapped multi-start bank.

    The reference treats SVI as a co-equal inference path
    (/root/reference/src/dynode/infer/inference.py:244-405); here the bank
    runs ``num_starts`` independently-initialized AutoMultivariateNormal
    optimizations as ONE program (infer/svi.py::run_multistart). Reports
    ELBO-steps/s (starts x steps / warm wall; warm = compiled bank reused
    via the multistart exec cache, median of 3 fresh-seed re-fits), the
    cold wall, the cross-start final-ELBO spread (a multi-modality
    diagnostic single-init SVI never sees), and the winning start's
    posterior-mean error vs the generating parameters (quality gate 0.05,
    same as the ChEES row).
    """
    from dynode_tpu.infer.predictive import Predictive
    from dynode_tpu.infer.svi import (
        SVI, Adam, AutoMultivariateNormal, Trace_ELBO,
    )

    guide = AutoMultivariateNormal(model)
    svi = SVI(model, guide, Adam(step_size=0.1), Trace_ELBO())

    def once(seed):
        t0 = time.perf_counter()
        res = svi.run_multistart(
            jax.random.PRNGKey(seed), num_steps=num_steps,
            num_starts=num_starts, obs=obs,
        )
        elbos = np.asarray(res.final_elbos)  # host fetch = tunnel-safe sync
        return time.perf_counter() - t0, res, elbos

    cold_wall, res, elbos = once(70)
    walls = []
    for seed in (71, 72, 73):
        w, res, elbos = once(seed)
        walls.append(w)
    warm_wall = float(np.median(walls))
    finite = elbos[np.isfinite(elbos)]
    spread = float(finite.max() - finite.min()) if finite.size else float("nan")

    predictive = Predictive(guide, params=res.params, num_samples=2000)
    samples = predictive(jax.random.PRNGKey(99), obs=obs)
    post = np.asarray(samples["r0_scales"], dtype=np.float64).reshape(
        -1, len(true_scales)
    )
    err = float(np.max(np.abs(post.mean(axis=0) - np.asarray(true_scales))))
    steps_per_sec = num_starts * num_steps / warm_wall
    print(
        f"[bench_nuts] SVI multi-start: {num_starts} starts x {num_steps} "
        f"steps warm {warm_wall:.1f}s (cold {cold_wall:.1f}s) -> "
        f"{steps_per_sec:,.0f} ELBO-steps/s; {finite.size}/{num_starts} "
        f"starts finite, ELBO spread {spread:.1f} nats; posterior max err "
        f"{err:.3f} (gate 0.05)",
        file=sys.stderr,
    )
    return steps_per_sec, cold_wall, warm_wall, err, spread


def _make_workload():
    """(model, obs, true_scales) for every entry point in this file."""
    model, forward = build_model()
    true_scales = jnp.array([1.1, 0.95, 1.05])
    c = forward(true_scales)
    key = jax.random.PRNGKey(0)
    obs = jax.random.poisson(key, jnp.maximum(jnp.diff(c, axis=0), 1e-6))
    return model, obs, true_scales


def run_oneshot():
    """One-shot latency mode (``python bench_nuts.py --oneshot``).

    The reference user's literal entry path: a fresh process builds the
    model and runs ``MCMCProcess.infer()`` once (which now enables the
    on-disk XLA executable cache on TPU, infer/inference.py). The CALLER
    times the whole subprocess -- imports, trace, compile-or-cache-load,
    sampling -- so run it twice: first call warms the disk cache, second
    measures the steady one-shot wall. Prints one JSON line with the
    posterior-drift gate.
    """
    from dynode_tpu.infer import MCMCProcess

    model, obs, true_scales = _make_workload()
    proc = MCMCProcess(
        numpyro_model=model,
        num_warmup=8,
        num_samples=8,
        # env override: lets the CPU test tier smoke this path in seconds
        num_chains=int(os.environ.get("DYNODE_ONESHOT_CHAINS", "1024")),
        nuts_max_tree_depth=MAX_TREE_DEPTH,
        sampler="chees",
        progress_bar=False,
        mcmc_kwargs={"steps_per_call": 16},
    )
    proc.infer(obs=obs)
    arr = np.asarray(
        proc.get_samples(group_by_chain=True)["r0_scales"], dtype=np.float64
    )
    drift = float(
        np.max(np.abs(arr.reshape(-1, 3).mean(axis=0) - np.asarray(true_scales)))
    )
    print(json.dumps({"oneshot_drift": round(drift, 4),
                      "oneshot_ok": drift < 0.05}))


def main():
    import dynode_tpu

    # persistent executable cache: a code-unchanged rerun of this bench
    # skips the multi-minute tunnel compiles (keyed on HLO -- code changes
    # miss cleanly); measured 387.6s -> 108.5s on the 1024-chain NUTS fit
    dynode_tpu.enable_compilation_cache()
    model, obs, true_scales = _make_workload()

    mcmc = MCMC(
        NUTS(model, dense_mass=True, max_tree_depth=MAX_TREE_DEPTH),
        num_warmup=NUM_WARMUP,
        num_samples=NUM_SAMPLES,
        num_chains=NUM_CHAINS,
        progress_bar=False,
        # bound each on-chip program to ~16 transitions: monolithic
        # multi-minute programs trip the TPU watchdog (worker crash)
        steps_per_call=16,
    )
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(0), obs=obs)
    cold_wall = time.perf_counter() - t0
    # warm (executable cache): the steady-state per-fit cost
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(1), obs=obs)
    wall = time.perf_counter() - t0

    by_chain = mcmc.get_samples(group_by_chain=True)["r0_scales"]
    arr = np.asarray(by_chain, dtype=np.float64)  # (chains, draws, 3)
    ess = min(
        effective_sample_size(arr[:, :, k]) for k in range(arr.shape[-1])
    )
    ef = mcmc.get_extra_fields()
    div = int(np.asarray(ef["diverging"]).sum())
    mean_leapfrogs = float(np.asarray(ef["num_steps"]).mean())
    per_chain_std = arr.std(axis=1).max(axis=-1)  # (chains,)
    stuck = int((per_chain_std < 1e-5).sum())
    post_mean = arr.reshape(-1, 3).mean(axis=0)
    print(
        f"[bench_nuts] {NUM_CHAINS} chains x ({NUM_WARMUP}+{NUM_SAMPLES}) "
        f"warm {wall:.1f}s (cold {cold_wall:.1f}s incl trace+compile); "
        f"min ESS {ess:.0f}; divergences {div}; "
        f"mean leapfrogs/transition {mean_leapfrogs:.1f}; "
        f"stuck chains {stuck}; posterior "
        f"means {np.round(post_mean, 3)} (true {np.asarray(true_scales)})",
        file=sys.stderr,
    )
    # opt-in: measure the NUTS(batched_potential_fn=) lane-major potential
    # (round-2 measurement: NO win over generic vmap at 1024 chains on this
    # model -- kept measurable so the conclusion can be re-checked cheaply)
    if os.environ.get("DYNODE_BENCH_BATCHED_POT"):
        batched = build_lane_major_potential(obs)
        mcmc_bp = MCMC(
            NUTS(model, dense_mass=True, max_tree_depth=MAX_TREE_DEPTH,
                 batched_potential_fn=batched),
            num_warmup=NUM_WARMUP,
            num_samples=NUM_SAMPLES,
            num_chains=NUM_CHAINS,
            progress_bar=False,
            steps_per_call=16,
        )
        t0 = time.perf_counter()
        mcmc_bp.run(jax.random.PRNGKey(1), obs=obs)
        bp_wall = time.perf_counter() - t0
        arr_bp = np.asarray(
            mcmc_bp.get_samples(group_by_chain=True)["r0_scales"]
        )
        bp_ess = min(
            effective_sample_size(arr_bp[:, :, k])
            for k in range(arr_bp.shape[-1])
        )
        print(
            f"[bench_nuts] batched-potential NUTS: {bp_wall:.1f}s, "
            f"min ESS {bp_ess:.0f} -> {bp_ess / bp_wall:.0f} ESS/s",
            file=sys.stderr,
        )

    nuts_ess_s = ess / wall
    # interim emission: a later-row failure/timeout must not erase the
    # headline already measured (round-4 lesson: BENCH_r04 parsed null)
    print(json.dumps({
        "metric": "multistrain_seirs_mcmc_ess_per_sec",
        "value": round(nuts_ess_s, 3),
        "unit": "ESS/s",
        "nuts_ess_per_sec": round(nuts_ess_s, 3),
        "partial": True,
    }), flush=True)
    chees_ess_s = 0.0
    try:
        chees_ess_s, chees_post = bench_chees(model, obs)
        drift = float(np.max(np.abs(chees_post - np.asarray(true_scales))))
        if drift > 0.05:
            print(
                f"[bench_nuts] WARNING: ChEES posterior drift {drift:.3f} "
                "from generating values; excluding from headline",
                file=sys.stderr,
            )
            chees_ess_s = 0.0
    except Exception as e:
        print(f"[bench_nuts] ChEES run failed: {e}", file=sys.stderr)

    speedup_4chain = 0.0
    try:
        (tpu_c, tpu_w, tpu_e), (cpu_c, cpu_w, cpu_e), speedup_4chain = (
            bench_4chain_vs_cpu(model, obs)
        )
        print(
            f"[bench_nuts] 4-chain NUTS (100+100, same program): TPU "
            f"{tpu_c:.1f}s cold / {tpu_w:.1f}s warm vs CPU {cpu_c:.1f}s / "
            f"{cpu_w:.1f}s -> {speedup_4chain:.1f}x warm wall "
            f"(BASELINE.md target >=50x; 4 tiny chains are latency-bound "
            f"-- the TPU's advantage is WIDTH)",
            file=sys.stderr,
        )
        # throughput ratio at each device's measured config (same per-draw
        # program): TPU wins by chain WIDTH, which is the production regime
        cpu_ess_s = cpu_e / cpu_w
        print(
            f"[bench_nuts] ESS/s: TPU {ess / wall:.0f} "
            f"({NUM_CHAINS} chains) vs CPU {cpu_ess_s:.2f} (4 chains) -> "
            f"{ess / wall / cpu_ess_s:.0f}x",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench_nuts] 4-chain comparison failed: {e}", file=sys.stderr)

    matched_quality = matched_quality_tuned = 0.0
    try:
        matched_quality, matched_quality_tuned, *_ = bench_matched_quality(
            model, obs
        )
    except Exception as e:
        print(f"[bench_nuts] matched-quality bench failed: {e}", file=sys.stderr)

    matched_quality_amortized = 0.0
    try:
        matched_quality_amortized, *_ = bench_matched_quality_amortized(
            model, obs
        )
    except Exception as e:
        print(
            f"[bench_nuts] amortized matched-quality bench failed: {e}",
            file=sys.stderr,
        )

    svi_steps_s = svi_err = 0.0
    try:
        svi_steps_s, _, _, svi_err, _ = bench_svi(model, obs, true_scales)
        if svi_err > 0.05:
            print(
                f"[bench_nuts] WARNING: SVI posterior err {svi_err:.3f} "
                "exceeds the 0.05 gate; zeroing the SVI row",
                file=sys.stderr,
            )
            svi_steps_s = 0.0
    except Exception as e:
        print(f"[bench_nuts] SVI bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "multistrain_seirs_mcmc_ess_per_sec",
                "value": round(max(nuts_ess_s, chees_ess_s), 3),
                "unit": "ESS/s",
                "vs_baseline": round(speedup_4chain, 2),
                "vs_baseline_note": "4-chain same-program NUTS warm wall-clock CPU/TPU",
                "nuts_ess_per_sec": round(nuts_ess_s, 3),
                "chees_ess_per_sec": round(chees_ess_s, 3),
                "matched_quality_speedup": round(matched_quality, 1),
                "matched_quality_speedup_tuned_cpu": round(
                    matched_quality_tuned, 1
                ),
                "matched_quality_speedup_tuned_cpu_amortized": round(
                    matched_quality_amortized, 1
                ),
                "matched_quality_note": (
                    "reference-configuration CPU 4-chain NUTS (500+100, "
                    "depth 10, diag mass, sequential) warm wall / TPU wall "
                    "to reach >= the same min ESS (1024-chain ChEES bank); "
                    "_tuned_cpu uses this repo's best CPU NUTS instead"
                ),
                "svi_elbo_steps_per_sec": round(svi_steps_s, 1),
                "svi_posterior_max_err": round(svi_err, 4),
            }
        )
    )


if __name__ == "__main__":
    if "--oneshot" in sys.argv:
        run_oneshot()
    else:
        main()
