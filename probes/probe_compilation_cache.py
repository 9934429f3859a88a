"""Measure the persistent compilation cache at NUTS scale on TPU.

Runs the SAME seeded 1024-chain NUTS-through-SIR fit in two fresh
subprocesses sharing one on-disk cache and reports each process's wall
split into compile-dominated first call vs the rest. The second process
should pay (almost) no compile: executables load from disk.

Usage: python probes/probe_compilation_cache.py
"""

import os
import subprocess
import sys
import tempfile

_CHILD = r"""
import sys, time
from dynode_tpu.utils import enable_compilation_cache
enable_compilation_cache(sys.argv[1], min_compile_time_secs=0.0)
import jax, jax.numpy as jnp
import numpy as np
from dynode_tpu import dist
from dynode_tpu.infer import MCMC, NUTS, sample

rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(1.3, 0.7, 500), jnp.float32)

def model(obs):
    mu = sample("mu", dist.Normal(0.0, 5.0))
    sigma = sample("sigma", dist.LogNormal(0.0, 1.0))
    sample("y", dist.Normal(mu, sigma), obs=obs)

t0 = time.perf_counter()
m = MCMC(NUTS(model, max_tree_depth=6), num_warmup=200, num_samples=200,
         num_chains=1024, progress_bar=False, steps_per_call=200)
m.run(jax.random.PRNGKey(0), data)
mu = float(np.asarray(m.get_samples()["mu"]).mean())
wall = time.perf_counter() - t0
print(f"WALL {wall:.2f} mu {mu:.4f}")
"""


def main():
    cache = tempfile.mkdtemp(prefix="dynode_xla_cache_")
    print(f"cache dir: {cache}", file=sys.stderr)
    walls = []
    for tag in ("cold(populates disk)", "fresh-process(disk hit)"):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, cache],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=3600,
        )
        if out.returncode != 0:
            print(out.stderr, file=sys.stderr)
            raise SystemExit(1)
        line = [l for l in out.stdout.splitlines() if l.startswith("WALL")][0]
        walls.append(float(line.split()[1]))
        print(f"{tag}: {line}")
    n_entries = sum(len(fs) for _, _, fs in os.walk(cache))
    print(
        f"speedup from disk cache: {walls[0] / walls[1]:.1f}x "
        f"({walls[0]:.1f}s -> {walls[1]:.1f}s, {n_entries} cache entries)"
    )


if __name__ == "__main__":
    main()
