"""Does SVI-initialized zero-warmup ChEES beat the 8+8 one-shot config?

The one-shot matched-quality TPU side (bench_nuts.bench_matched_quality)
is bound by its ~16 sequential ChEES transitions (8 warmup + 8 draws).
chees_warm_start_from_guide replaces the 8 warmup transitions with a
multi-start SVI bank (one compiled program, milliseconds of device time),
so the one-shot fit pays SVI + 8 sampling transitions only.

Measures, on the real TPU, both variants end-to-end (cold excluded, 3
fresh-seed warm repeats each):
  A: ChEES 1024 x (8 warmup + 8 draws)                    [current bench]
  B: run_multistart(256 x 200) -> warm start -> ChEES 1024 x (0 + 8),
     first 2 draws discarded as burn-in
with cross-chain-scatter ESS and posterior-mean agreement between the two
(and vs the generating values). Decision input for wiring a
`matched_quality_speedup_tuned_cpu_sviinit` bench row.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench_nuts
from dynode_tpu.infer import (
    MCMC,
    SVI,
    Adam,
    AutoMultivariateNormal,
    ChEES,
    Trace_ELBO,
    chees_warm_start_from_guide,
)

C = 1024


def scatter_ess_and_mean(mcmc, burn=0):
    arr = np.asarray(
        mcmc.get_samples(group_by_chain=True)["r0_scales"], dtype=np.float64
    )[:, burn:]
    flat = arr.reshape(-1, arr.shape[-1])
    chain_means = arr.mean(axis=1)
    se2 = chain_means.var(axis=0, ddof=1) / arr.shape[0]
    ess = float(np.min(flat.var(axis=0) / np.maximum(se2, 1e-30)))
    return ess, flat.mean(axis=0)


def main():
    model, forward = bench_nuts.build_model()
    true_scales = jnp.array([1.1, 0.95, 1.05])
    c = forward(true_scales)
    obs = jax.random.poisson(
        jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6)
    )

    # ---- variant A: the current one-shot config --------------------------
    def a_once(seed):
        m = MCMC(
            ChEES(model), num_warmup=8, num_samples=8, num_chains=C,
            progress_bar=False,
        )
        t0 = time.perf_counter()
        m.run(jax.random.PRNGKey(seed), obs=obs)
        wall = time.perf_counter() - t0
        ess, mean = scatter_ess_and_mean(m)
        return wall, ess, mean

    a_once(10)  # cold
    a_runs = [a_once(s) for s in (11, 12, 13)]
    a_wall = float(np.median([r[0] for r in a_runs]))
    a_ess = float(np.median([r[1] for r in a_runs]))
    a_mean = np.mean([r[2] for r in a_runs], axis=0)
    print(
        f"A  8+8 ChEES:            wall {a_wall:.3f}s  ESS {a_ess:.0f}  "
        f"mean {np.round(a_mean, 4)}"
    )

    # ---- variant B: SVI-init, zero warmup --------------------------------
    guide = AutoMultivariateNormal(model)
    svi = SVI(model, guide, Adam(step_size=0.1), Trace_ELBO())

    def b_once(seed):
        k_svi, k_ws, k_run = jax.random.split(jax.random.PRNGKey(seed), 3)
        t0 = time.perf_counter()
        res = svi.run_multistart(
            k_svi, num_steps=200, num_starts=256, obs=obs
        )
        _ = np.asarray(res.final_elbos)  # host sync (tunnel-safe timing)
        warm = chees_warm_start_from_guide(guide, res.params, C, k_ws)
        m = MCMC(
            ChEES(model), num_warmup=0, num_samples=8, num_chains=C,
            progress_bar=False,
        )
        m.run(k_run, obs=obs, warm_start=warm)
        wall = time.perf_counter() - t0
        ess, mean = scatter_ess_and_mean(m, burn=2)
        return wall, ess, mean

    b_once(20)  # cold (compiles SVI bank + sampling program)
    b_runs = [b_once(s) for s in (21, 22, 23)]
    b_wall = float(np.median([r[0] for r in b_runs]))
    b_ess = float(np.median([r[1] for r in b_runs]))
    b_mean = np.mean([r[2] for r in b_runs], axis=0)
    print(
        f"B  SVI(256x200)+0+8:     wall {b_wall:.3f}s  ESS {b_ess:.0f}  "
        f"mean {np.round(b_mean, 4)}"
    )

    drift = float(np.max(np.abs(a_mean - b_mean)))
    sem = 0.05 / np.sqrt(min(a_ess, b_ess))
    print(
        f"drift A-vs-B {drift:.4f} (5-sigma limit {5 * sem + 1e-3:.4f}); "
        f"speedup B/A = {a_wall / b_wall:.2f}x; "
        f"B ESS vs CPU-tuned floor (320): {b_ess:.0f}"
    )


if __name__ == "__main__":
    main()
