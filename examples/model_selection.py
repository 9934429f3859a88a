"""Observation-model selection with PSIS-LOO: Poisson vs NegativeBinomial.

The workflow a reference user runs through arviz (``az.loo`` /
``az.compare`` on the ``az.from_numpyro`` export of
``MCMCProcess.to_arviz()`` — reference:
src/dynode/infer/inference.py:208-241), entirely in-repo:

1. simulate an age-stratified SIR epidemic (same family as the flagship
   examples/sir_infer_parameters.py),
2. generate OVERDISPERSED surveillance counts (negative-binomial noise
   around the true incidence — dropout/batching makes real case counts
   overdispersed, the reason dist.NegativeBinomial and the zero-inflated
   families exist),
3. fit two observation models to the same counts: Poisson (misspecified
   — variance pinned to the mean) and NegativeBinomial (learns the
   overdispersion),
4. score both with PSIS-LOO from the fits' ``log_likelihood`` groups and
   rank with ``infer.compare``.

The NB model should win decisively (elpd_diff >> dse), with every
pareto_k < 0.7; the Poisson's fake precision also corrupts its r0
posterior, which the printout shows next to the truth.
"""

import _bootstrap

import jax.numpy as jnp
import numpy as np

import dynode_tpu.dist as dist
from dynode_tpu import MCMCProcess, Strain
from dynode_tpu.config import SimulationConfig
from dynode_tpu.infer import compare, handlers, loo
from sir_age_stratified import get_config as get_static_config
from sir_age_stratified import run_simulation

TRUE_CONCENTRATION = 4.0  # variance = mu + mu^2/4: strong overdispersion


def _incidence(config: SimulationConfig, tf):
    solution = run_simulation(config, tf)
    return jnp.maximum(jnp.diff(solution.ys[config.idx.r], axis=0), 1e-6)


def model_poisson(config: SimulationConfig, tf, obs_data):
    handlers.sample(
        "cases", dist.Poisson(_incidence(config, tf)), obs=obs_data
    )


def model_negbin(config: SimulationConfig, tf, obs_data):
    conc = handlers.sample("concentration", dist.LogNormal(1.5, 1.0))
    handlers.sample(
        "cases",
        dist.NegativeBinomial(_incidence(config, tf), conc),
        obs=obs_data,
    )


def get_config() -> SimulationConfig:
    """Static SIR config with the strain's rates replaced by priors."""
    sir_config = get_static_config(r_0=2.0, infectious_period=7.0)
    sir_config.parameters.transmission_params.strains = [
        Strain(
            strain_name="swo9",
            r0=dist.TransformedDistribution(
                dist.Beta(0.5, 0.5), dist.AffineTransform(1.5, 1)
            ),
            infectious_period=dist.TruncatedNormal(
                loc=8, scale=2, low=2, high=15
            ),
        )
    ]
    return sir_config


if __name__ == "__main__":
    FAST = _bootstrap.fast_mode()
    tf = 50 if FAST else 100

    # --- synthetic overdispersed surveillance counts -------------------
    rng = np.random.default_rng(0)
    mu = np.asarray(_incidence(get_static_config(), tf))
    gamma = rng.gamma(TRUE_CONCENTRATION, 1.0 / TRUE_CONCENTRATION, mu.shape)
    counts = jnp.asarray(rng.poisson(mu * gamma), dtype=jnp.float32)

    # --- fit both observation models on the SAME counts ----------------
    fits = {}
    for name, m in [("poisson", model_poisson), ("negbin", model_negbin)]:
        print(f"fitting {name}")
        proc = MCMCProcess(
            numpyro_model=m,
            num_warmup=100 if FAST else 400,
            num_samples=50 if FAST else 200,
            num_chains=1,
            nuts_max_tree_depth=8,
            progress_bar=False,
        )
        proc.infer(config=get_config(), tf=tf, obs_data=counts)
        fits[name] = proc

    # --- PSIS-LOO from the export's log_likelihood group ---------------
    scores = {
        name: loo(proc.to_arviz()) for name, proc in fits.items()
    }
    for name, s in scores.items():
        print(f"--- {name} ---\n{s}")
    table = compare(scores)
    print(f"{'model':>10} {'rank':>4} {'elpd':>10} {'diff':>8} "
          f"{'dse':>7} {'weight':>7}")
    for name, row in table.items():
        print(
            f"{name:>10} {row['rank']:>4} {row['elpd']:>10.1f} "
            f"{row['elpd_diff']:>8.1f} {row['dse']:>7.1f} "
            f"{row['weight']:>7.2f}"
        )

    best = next(iter(table))
    assert best == "negbin", (
        f"expected the overdispersion-aware model to win, got {best!r}"
    )
    for name, proc in fits.items():
        r0 = float(jnp.mean(proc.get_samples()["strains_0_r0"]))
        print(f"{name}: posterior mean r0 = {r0:.3f} (true 2.0)")
    conc = float(jnp.mean(fits["negbin"].get_samples()["concentration"]))
    print(
        f"negbin: posterior mean concentration = {conc:.2f} "
        f"(true {TRUE_CONCENTRATION})"
    )
