"""Profile the ChEES knee: where does per-transition wall go at wide banks?

Decomposition at 4096/8192 chains on the multistrain fit (VERDICT r2 #10):
  unit       = wall of ONE bank potential+grad eval (the leapfrog unit)
  leapfrogs  = mean leapfrogs/transition (num_steps extra field) x unit
  total      = sampling-phase wall / transitions
  residual   = total - leapfrogs  (adaptation math + draw collection +
               dispatch; warmup additionally pays Welford/Adam updates)
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


def _sync(x):
    return float(np.asarray(jax.device_get(x)).sum())


for n_chains in (4096, 8192):
    def run_once(seed):
        mcmc = MCMC(
            ChEES(model),
            num_warmup=100,
            num_samples=100,
            num_chains=n_chains,
            progress_bar=False,
            steps_per_call=25,  # 4 dispatches/phase (watchdog-safe)
        )
        t0 = time.perf_counter()
        mcmc.run(jax.random.PRNGKey(seed), obs=obs)
        return time.perf_counter() - t0, mcmc

    cold, _ = run_once(1)  # includes warmup+sampling compiles
    wall, mcmc = run_once(2)  # warm: in-process jit cache, steady state
    ns = np.asarray(mcmc.get_extra_fields(group_by_chain=True)["num_steps"])
    mean_lf = float(ns.mean())

    # unit: one bank potential+grad (what one leapfrog costs), fresh inputs
    from dynode_tpu.infer.util import (
        flatten_potential,
        get_model_trace,
        get_transforms,
        initialize_latents,
        make_potential_fn,
        unconstrain_sample,
        observed_logprob_centers,
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
    zb = jnp.tile(flat0[None], (n_chains, 1))
    _sync(pg(zb)[0])  # compile
    units = []
    for r in range(3):
        zr = zb + 0.01 * jax.random.normal(jax.random.PRNGKey(10 + r), zb.shape)
        t0 = time.perf_counter()
        _sync(pg(zr)[0])
        units.append(time.perf_counter() - t0)
    unit = min(units)

    per_tr = wall / 200.0
    lf_share = mean_lf * unit
    print(
        f"chains={n_chains}: cold {cold:.1f}s, "
        f"warm wall {wall:.1f}s -> {per_tr * 1e3:.1f} ms/"
        f"transition; mean leapfrogs {mean_lf:.1f} x unit {unit * 1e3:.2f} ms"
        f" = {lf_share * 1e3:.1f} ms ({100 * lf_share / per_tr:.0f}%); "
        f"residual {1e3 * (per_tr - lf_share):.1f} ms "
        f"(adaptation+collection+dispatch)",
        flush=True,
    )
