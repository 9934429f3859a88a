"""Smoking-gun check: does a warm (2nd, same-process) MCMC ChEES run
re-trace and re-compile its segments?

probe_chees_profile2 put device compute at ~41 ms/transition (25-transition
scan, 4096 chains) yet the full runner pays ~850 ms/transition on "warm"
runs. Hypothesis: make_chees_parts builds FRESH closures per run(), so the
second run misses the in-process jit cache entirely and pays trace +
(server-cached) compile round-trips per chunk program.

jax.log_compiles prints every XLA compilation; count them per run.

Measured (v5e-1):
  BEFORE the executable cache: 4 compiles on every warm run (~165-183 s).
  AFTER (2026-08-17): cold 122.0 s / 57 compiles; warm-same-instance
  20.7 s / 0 compiles -- twice, to the decisecond. Warm runs are at the
  device-compute bound.
"""

import _bootstrap  # noqa: F401

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_nuts
from dynode_tpu.infer import MCMC, ChEES

logging.getLogger("jax").setLevel(logging.WARNING)

model, forward = bench_nuts.build_model()
true_scales = jnp.array([1.1, 0.95, 1.05])
c = forward(true_scales)
obs = jax.random.poisson(
    jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6)
)


class _CountCompiles(logging.Handler):
    def __init__(self):
        super().__init__()
        self.n = 0

    def emit(self, record):
        if "Compiling" in record.getMessage():
            self.n += 1


mcmc = MCMC(
    ChEES(model),
    num_warmup=100,
    num_samples=100,
    num_chains=4096,
    progress_bar=False,
    steps_per_call=25,
)

for label in ("cold", "warm-same-instance", "warm-same-instance-2"):
    h = _CountCompiles()
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(h)
    logger.setLevel(logging.DEBUG)
    with jax.log_compiles():
        t0 = time.perf_counter()
        mcmc.run(jax.random.PRNGKey(1), obs=obs)
        float(np.asarray(mcmc.get_samples()["r0_scales"]).sum())
        wall = time.perf_counter() - t0
    logger.removeHandler(h)
    print(f"{label}: wall {wall:.1f}s, XLA compiles {h.n}", flush=True)
