"""Where does the matched-quality 8+8 ChEES run's 0.8s wall go?

The TPU side of the matched-quality bench (bench_nuts.bench_matched_quality)
runs 1024 chains x (8 warmup + 8 draws) monolithically: init dispatch + one
warmup chunk + one sampling chunk + host fetch. This probe times each phase
separately (warm, exec-cache hit) to decide whether the floor is tunnel
dispatch latency (fuse phases into ONE program) or real transition compute
(nothing to fuse away).

Measured (v5e tunnel, 2026-08-18): null jit dispatch+fetch ~53ms; toy-model
8+8 monolithic warm wall ~0.16s (= the ~3-dispatch floor of run()); the same
run with steps_per_call=1 pays 16 dispatches -> ~0.56s (~28ms marginal per
chunk dispatch). The matched-quality bench's 0.8s wall on the REAL flagship
ODE model is therefore ~80% transition compute, ~20% dispatch: fusing
init/warm/sample into one program would buy <=0.1s. VERDICT r3's
"sequential-transition floor" is real leapfrog work, and the amortized
(warm-start) row is the right lever -- not phase fusion.

Usage: python probes/probe_chees_latency.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from dynode_tpu import dist  # noqa: E402
from dynode_tpu.infer import MCMC, ChEES, sample  # noqa: E402

K = 3


def model(obs=None):
    r0 = sample("r0_scales", dist.TruncatedNormal(1.2, 0.3, low=0.3), sample_shape=(K,))
    rate = 40.0 * r0
    sample("obs", dist.Poisson(rate), obs=obs)


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    obs = jnp.asarray(
        np.random.default_rng(0).poisson(40.0 * np.array([1.1, 0.9, 1.05]))
    ).astype(jnp.float32)

    mcmc = MCMC(
        ChEES(model), num_warmup=8, num_samples=8, num_chains=1024,
        progress_bar=False,
    )
    # cold run: trace + compile
    t0 = time.perf_counter()
    mcmc.run(key, obs=obs)
    print(f"cold run: {time.perf_counter() - t0:.2f}s")

    # warm runs: total wall
    for seed in (1, 2, 3):
        t0 = time.perf_counter()
        mcmc.run(jax.random.PRNGKey(seed), obs=obs)
        _ = np.asarray(mcmc.get_samples()["r0_scales"])
        print(f"warm run total (incl fetch): {time.perf_counter() - t0:.3f}s")

    # dispatch-cost isolation: the same 8+8 run with steps_per_call=1 pays
    # 16 chunk dispatches instead of 2; the warm-wall delta / 14 is the
    # per-dispatch tunnel cost on this trivial potential
    mcmc_chunked = MCMC(
        ChEES(model), num_warmup=8, num_samples=8, num_chains=1024,
        progress_bar=False, steps_per_call=1,
    )
    mcmc_chunked.run(key, obs=obs)  # cold
    for seed in (4, 5, 6):
        t0 = time.perf_counter()
        mcmc_chunked.run(jax.random.PRNGKey(seed), obs=obs)
        _ = np.asarray(mcmc_chunked.get_samples()["r0_scales"])
        print(
            f"warm run, steps_per_call=1 (16 dispatches): "
            f"{time.perf_counter() - t0:.3f}s"
        )

    # null dispatch: measure pure tunnel round-trip latency
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    _ = jax.block_until_ready(f(x))
    for _ in range(3):
        t0 = time.perf_counter()
        y = jax.block_until_ready(f(x))
        float(y[0])
        print(f"null jit dispatch+fetch: {time.perf_counter() - t0:.4f}s")


if __name__ == "__main__":
    main()
