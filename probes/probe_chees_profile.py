"""Profile the ChEES knee: where does per-transition wall go at wide banks?

Phase-split decomposition at 4096 chains on the multistrain fit (VERDICT
r2 #10). Naive wall/transitions conflates warmup (adaptation math, longer
early trajectories while eps is still small) with sampling. Tunnel wall
variance is +-30s on a ~130s program, so single-run subtraction is
useless (a first attempt measured the SHORTER config slower); instead:

  full      = min-of-3 warm full runs (100 warmup + 100 sampling)
  sampling  = min-of-3 warm_start runs (sampling phase ONLY -- warm_start
              skips warmup; same compiled sampling chunks)
  warmup    = full - sampling
  leapfrog share = mean sampling num_steps x unit, where
  unit      = one bank potential+grad eval (min of 3, fresh inputs,
              fetch-synced)

Residual(sampling) = per-transition sampling cost - leapfrog share:
momentum draw, accept/select, draw collection, while_loop overhead.
Residual(warmup) folds in DA/Welford/ChEES-Adam AND the longer early
trajectories (not separable without per-iteration collection).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_nuts
from dynode_tpu.infer import MCMC, ChEES

model, forward = bench_nuts.build_model()
true_scales = jnp.array([1.1, 0.95, 1.05])
c = forward(true_scales)
obs = jax.random.poisson(
    jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6)
)

N_CHAINS = 4096


def _sync(x):
    return float(np.asarray(jax.device_get(x)).sum())


def run_once(seed, num_samples):
    mcmc = MCMC(
        ChEES(model),
        num_warmup=100,
        num_samples=num_samples,
        num_chains=N_CHAINS,
        progress_bar=False,
        steps_per_call=25,  # identical chunk shapes for 25/100 samples
    )
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(seed), obs=obs)
    # force materialization of the collected draws before stopping the clock
    _sync(mcmc.get_samples()["r0_scales"])
    return time.perf_counter() - t0, mcmc


def run_sampling_only(seed, warm_start):
    mcmc = MCMC(
        ChEES(model),
        num_warmup=100,
        num_samples=100,
        num_chains=N_CHAINS,
        progress_bar=False,
        steps_per_call=25,
    )
    t0 = time.perf_counter()
    mcmc.run(jax.random.PRNGKey(seed), obs=obs, warm_start=warm_start)
    _sync(mcmc.get_samples()["r0_scales"])
    return time.perf_counter() - t0, mcmc


# tunnel wall variance is +-30s on a ~130s program, so single-run
# subtraction is useless: take min-of-3 per config (min rides the best
# tunnel weather) and measure sampling-only DIRECTLY via warm_start
cold, mcmc0 = run_once(1, 100)  # compiles warmup + sampling segments
ws = mcmc0.warm_start_state()
run_sampling_only(10, ws)  # compiles the warm-start pot re-eval
wall_a = min(run_once(2 + r, 100)[0] for r in range(3))
wall_s = min(run_sampling_only(20 + r, ws)[0] for r in range(3))
ns = np.asarray(mcmc0.get_extra_fields(group_by_chain=True)["num_steps"])
mean_lf = float(ns.mean())

# unit: one bank potential+grad (what one leapfrog costs), fresh inputs
from dynode_tpu.infer.util import (  # noqa: E402
    flatten_potential,
    get_model_trace,
    get_transforms,
    initialize_latents,
    make_potential_fn,
    observed_logprob_centers,
    unconstrain_sample,
)

tr = get_model_trace(model, jax.random.PRNGKey(2), obs=obs)
transforms = get_transforms(tr)
centers = observed_logprob_centers(tr)
init = initialize_latents(tr, jax.random.PRNGKey(3))
flat_pot, flat0, _ = flatten_potential(
    make_potential_fn(model, (), {"obs": obs}, transforms, centers=centers),
    unconstrain_sample(transforms, init),
)
pg = jax.jit(jax.vmap(jax.value_and_grad(flat_pot)))
zb = jnp.tile(flat0[None], (N_CHAINS, 1))
_sync(pg(zb)[0])  # compile
units = []
for r in range(3):
    zr = zb + 0.01 * jax.random.normal(jax.random.PRNGKey(10 + r), zb.shape)
    t0 = time.perf_counter()
    _sync(pg(zr)[0])
    units.append(time.perf_counter() - t0)
unit = min(units)

samp_tr = wall_s / 100.0
warm_wall = wall_a - wall_s
warm_tr = warm_wall / 100.0
lf_share = mean_lf * unit
print(
    f"chains={N_CHAINS}: cold {cold:.1f}s, warm full (min/3) {wall_a:.1f}s, "
    f"sampling-only via warm_start (min/3) {wall_s:.1f}s\n"
    f"  sampling: {samp_tr * 1e3:.1f} ms/transition; mean leapfrogs "
    f"{mean_lf:.1f} x unit {unit * 1e3:.2f} ms = {lf_share * 1e3:.1f} ms "
    f"({100 * lf_share / samp_tr:.0f}%); residual "
    f"{1e3 * (samp_tr - lf_share):.1f} ms (momentum+accept+collection)\n"
    f"  warmup:   {warm_tr * 1e3:.1f} ms/transition "
    f"({warm_tr / samp_tr:.2f}x sampling; adaptation math + longer early "
    f"trajectories while eps is small)",
    flush=True,
)
