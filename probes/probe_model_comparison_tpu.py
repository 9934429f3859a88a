"""TPU end-to-end validation of the model-comparison surface (round 4).

Runs the full workflow on the real chip: overdispersed synthetic counts,
two ChEES chain-bank fits (Poisson vs NegativeBinomial observation
models), vmapped log_likelihood + uncondition'd posterior-predictive
replay on device, then host-side PSIS-LOO / compare / loo_pit.

Expected: negbin ranks first with elpd_diff >> dse, all pareto_k < 0.7,
negbin's loo_pit ~uniform while poisson's is U-shaped (overconfident).

Usage: python probes/probe_model_comparison_tpu.py   (TPU; ~1-2 min)
"""

import _bootstrap  # noqa: F401

import time

import jax
import jax.numpy as jnp
import numpy as np

from dynode_tpu import dist
from dynode_tpu.infer import (
    ChEES,
    MCMC,
    Predictive,
    compare,
    handlers,
    log_likelihood,
    loo,
    loo_pit,
)

TRUE_CONC = 4.0
N_OBS = 200
CHAINS = 1024

rng = np.random.default_rng(0)
mu_true = 30.0
gamma = rng.gamma(TRUE_CONC, 1.0 / TRUE_CONC, N_OBS)
counts = jnp.asarray(rng.poisson(mu_true * gamma), jnp.float32)


def model_poisson(obs):
    rate = handlers.sample("rate", dist.LogNormal(3.0, 1.0))
    handlers.sample("cases", dist.Poisson(rate), obs=obs)


def model_negbin(obs):
    rate = handlers.sample("rate", dist.LogNormal(3.0, 1.0))
    conc = handlers.sample("conc", dist.LogNormal(1.5, 1.0))
    handlers.sample("cases", dist.NegativeBinomial(rate, conc), obs=obs)


def fit_and_score(name, model):
    t0 = time.perf_counter()
    m = MCMC(
        ChEES(model),
        num_warmup=200,
        num_samples=200,
        num_chains=CHAINS,
        progress_bar=False,
    )
    m.run(jax.random.PRNGKey(0), counts)
    samples = m.get_samples()
    # keep device->host traffic small: thin the bank before replay
    thin = {k: v[:: CHAINS // 8] for k, v in samples.items()}
    ll = log_likelihood(model, thin, counts)
    y_rep = Predictive(
        model, posterior_samples=thin, uncondition_observed=True
    )(jax.random.PRNGKey(1), obs=counts)
    wall = time.perf_counter() - t0
    score = loo(ll)
    pit = loo_pit(np.asarray(counts), y_rep["cases"], ll)
    extreme = float(((pit < 0.05) | (pit > 0.95)).mean())
    print(
        f"{name}: wall {wall:.1f}s  rate_mean "
        f"{float(np.asarray(samples['rate'], np.float64).mean()):.2f}  "
        f"elpd {score.elpd:.1f}  max_k {score.pareto_k.max():.3f}  "
        f"pit_extreme_frac {extreme:.3f}"
    )
    return score, extreme


if __name__ == "__main__":
    print("devices:", jax.devices())
    s_p, ex_p = fit_and_score("poisson", model_poisson)
    s_nb, ex_nb = fit_and_score("negbin", model_negbin)
    table = compare({"poisson": s_p, "negbin": s_nb})
    for nm, row in table.items():
        print(
            f"{nm:>8} rank {row['rank']} elpd {row['elpd']:.1f} "
            f"diff {row['elpd_diff']:.1f} dse {row['dse']:.1f} "
            f"weight {row['weight']:.2f}"
        )
    assert next(iter(table)) == "negbin"
    assert table["poisson"]["elpd_diff"] > 2 * table["poisson"]["dse"]
    assert ex_nb < 0.2 < ex_p, (ex_nb, ex_p)
    print("TPU model-comparison workflow OK")
