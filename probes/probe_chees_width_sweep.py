"""Where is the ChEES ESS/s optimum now? (chain width x draws sweep)

Round 2 measured the chain-count knee at ~8k with that round's sampler;
rounds 3-4 changed the transition cost profile (exec cache, constant-step
potential, stuck-chain rescue). The bench headline still runs 4096 x
(200+200). At 4096 chains x 200 draws the measured min ESS (793k) sits at
~97% of the chains*draws ceiling -- every retained draw is effectively
independent -- so ESS/s should scale with BOTH knobs until the chip
saturates or adaptation degrades.

Sweeps (chains, draws) over the bench model, reporting warm-run ESS/s,
posterior drift vs truth, divergences, and stuck chains for each cell.

Usage: python probes/probe_chees_width_sweep.py  (TPU; ~15 min cold)
"""

import sys
import time

import _bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

import bench_nuts

CELLS = [
    (4096, 200, 200),   # current headline
    (8192, 200, 200),   # round-2 knee
    (16384, 200, 200),  # past the knee?
    (4096, 200, 400),   # amortize warmup over more draws
    (8192, 200, 400),
    (4096, 200, 800),   # draws keep scaling: 42.3k ESS/s measured
    (4096, 200, 1600),  # 50.2k ESS/s; f64-verified stationary (the old
                        # "drift toward the prior" at wide draws was the
                        # host f32 strided-mean artifact, see CLAUDE.md)
]


def main():
    model, forward = bench_nuts.build_model()
    truth = jnp.array([1.1, 0.95, 1.05])
    c = forward(truth)
    obs = jax.random.poisson(
        jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6)
    )
    results = []
    for chains, warmup, draws in CELLS:
        try:
            t0 = time.perf_counter()
            ess_s, post = bench_nuts.bench_chees(
                model, obs, num_chains=chains, num_warmup=warmup,
                num_samples=draws,
            )
            total = time.perf_counter() - t0
            drift = float(np.max(np.abs(post - np.asarray(truth))))
            ok = drift <= 0.05
            results.append((chains, warmup, draws, ess_s, drift, ok))
            print(
                f"[sweep] {chains} x ({warmup}+{draws}): {ess_s:,.0f} ESS/s "
                f"drift {drift:.3f} {'OK' if ok else 'DRIFT-FAIL'} "
                f"(cell wall incl cold {total:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[sweep] {chains} x ({warmup}+{draws}) failed: {e}",
                  file=sys.stderr)
    if results:
        best = max(results, key=lambda r: r[3] if r[5] else 0.0)
        print(
            f"\nbest valid cell: {best[0]} chains x ({best[1]}+{best[2]}) "
            f"at {best[3]:,.0f} ESS/s (headline cell is 4096 x 200+200)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
