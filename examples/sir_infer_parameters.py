"""Full simulate -> noise -> fit -> project loop: the flagship inference demo.

Workload parity with the reference's examples/sir_infer_parameters.py:
synthetic Poisson incidence from a fixed age-stratified SIR, NUTS (MCMC) and
SVI fits of the r0/infectious-period priors, posterior inspection, and a
posterior-predictive projection to a longer horizon with obs_data=None.
"""

import _bootstrap

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import dynode_tpu.dist as dist
from dynode_tpu import MCMCProcess, Strain, SVIProcess
from dynode_tpu.config import SimulationConfig
from dynode_tpu.infer import Predictive, handlers
from sir_age_stratified import get_config as get_static_config
from sir_age_stratified import run_simulation


def model(config: SimulationConfig, tf, obs_data):
    """Poisson-incidence observation model over an SIR simulation."""
    solution = run_simulation(config, tf)
    incidence = jnp.diff(solution.ys[config.idx.r], axis=0)
    incidence = jnp.maximum(incidence, 1e-6)
    handlers.sample(
        "inf_incidence", dist.Poisson(incidence), obs=obs_data
    )
    return solution


def get_config() -> SimulationConfig:
    """Static SIR config with the strain replaced by priors."""
    sir_config = get_static_config(r_0=2.0, infectious_period=7.0)
    sir_config.parameters.transmission_params.strains = [
        Strain(
            strain_name="swo9",
            r0=dist.TransformedDistribution(
                dist.Beta(0.5, 0.5),
                dist.AffineTransform(1.5, 1),
            ),
            infectious_period=dist.TruncatedNormal(
                loc=8, scale=2, low=2, high=15
            ),
        )
    ]
    return sir_config


if __name__ == "__main__":
    FAST = _bootstrap.fast_mode()
    tf_fit = 50 if FAST else 100
    # synthetic data from the fixed-parameter model
    config_static = get_static_config()
    solution = run_simulation(config_static, tf=tf_fit)
    idx = config_static.idx
    incidence = jnp.diff(solution.ys[idx.r], axis=0)

    config_infer = get_config()
    inference_process_mcmc = MCMCProcess(
        numpyro_model=model,
        num_warmup=100 if FAST else 500,
        num_samples=50 if FAST else 100,
        num_chains=1,
        nuts_max_tree_depth=10,
    )
    inference_process_svi = SVIProcess(
        numpyro_model=model,
        num_iterations=100 if FAST else 500,
        num_samples=50 if FAST else 100,
    )

    print("fitting MCMC")
    inference_process_mcmc.infer(
        config=config_infer, tf=tf_fit, obs_data=incidence
    )
    posterior_samples_mcmc = inference_process_mcmc.get_samples()

    print("fitting SVI")
    inference_process_svi.infer(
        config=config_infer, tf=tf_fit, obs_data=incidence
    )
    posterior_samples_svi = inference_process_svi.get_samples()

    print(
        "True R0: 2.0, infectious period: 7.0\n"
        f"MCMC posterior R0: {float(jnp.mean(posterior_samples_mcmc['strains_0_r0'])):.4f}, "
        f"infectious period: {float(jnp.mean(posterior_samples_mcmc['strains_0_infectious_period'])):.4f}\n"
        f"SVI posterior R0: {float(jnp.mean(posterior_samples_svi['strains_0_r0'])):.4f}, "
        f"infectious period: {float(jnp.mean(posterior_samples_svi['strains_0_infectious_period'])):.4f}"
    )

    svi_arviz = inference_process_svi.to_arviz()
    print(svi_arviz)
    mcmc_arviz = inference_process_mcmc.to_arviz()
    print(mcmc_arviz)
    print("posterior summary:", mcmc_arviz.summary())

    # density interval for the R0 posterior (the reference draws this with
    # az.plot_density at examples/sir_infer_parameters.py:141-149)
    from dynode_tpu.utils import plot_posterior_density

    fig = plot_posterior_density(
        [mcmc_arviz],
        data_labels=["R0"],
        var_names=["strains_0_r0"],
        shade=0.2,
    )
    fig.suptitle("Density Interval for R0 Posterior Samples (MCMC)")
    fig.savefig("sir_infer_r0_density.png", dpi=100)

    # project forward to a longer horizon with no observations
    tf_proj = 2 * tf_fit
    predictive_mcmc = Predictive(
        model,
        posterior_samples=posterior_samples_mcmc,
        exclude_deterministic=False,
    )
    posterior_incidence_mcmc = predictive_mcmc(
        rng_key=inference_process_mcmc.inference_prngkey,
        config=config_infer,
        tf=tf_proj,
        obs_data=None,
    )

    svi_state = inference_process_svi._inference_state
    predictive_svi = Predictive(
        model,
        guide=inference_process_svi._inferer.guide,
        params=svi_state.params,
        num_samples=100 if FAST else 1000,
    )
    posterior_incidence_svi = predictive_svi(
        rng_key=inference_process_mcmc.inference_prngkey,
        config=config_infer,
        tf=tf_proj,
        obs_data=None,
    )

    key = inference_process_mcmc.inference_prngkey
    n_draws = posterior_incidence_mcmc["inf_incidence"].shape[0]
    picks = jax.random.choice(key, n_draws, shape=(50,))
    for sample in picks:
        plt.plot(
            jnp.sum(posterior_incidence_mcmc["inf_incidence"][sample], axis=1),
            color="C0",
            alpha=0.2,
        )
    plt.plot(jnp.sum(incidence, axis=1), color="k", label="true incidence")
    plt.legend()
    plt.title("MCMC posterior predictive projection (dynode_tpu)")
    plt.savefig("sir_infer_mcmc.png", dpi=100)
