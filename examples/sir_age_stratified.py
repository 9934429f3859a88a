"""Age-stratified SIR with priors sampled via sample_then_resolve.

Workload parity with the reference's examples/sir_age_stratified.py.
Exports ``get_config`` and ``run_simulation`` reused by
examples/sir_infer_parameters.py.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from dynode_tpu import pytree_dataclass, simulate
from dynode_tpu.config import SimulationConfig
from dynode_tpu.infer import sample_then_resolve
from dynode_tpu.models.sir import sir_age_config
from dynode_tpu.ode import Solution
from dynode_tpu.simulation import AbstractODEParams
from dynode_tpu.typing import CompartmentGradients, CompartmentState


def get_config(r_0=2.0, infectious_period=7.0) -> SimulationConfig:
    """Two-age-group SIR with a spectral-radius-normalized contact matrix."""
    return sir_age_config(r_0=r_0, infectious_period=infectious_period)


@pytree_dataclass
class SIR_ODEParams(AbstractODEParams):
    beta: jnp.ndarray
    gamma: jnp.ndarray
    contact_matrix: jnp.ndarray


def get_odeparams(config: SimulationConfig) -> SIR_ODEParams:
    """Sample/resolve any priors, then vectorize into RHS parameters."""
    tp = sample_then_resolve(config.parameters.transmission_params)
    strain = tp.strains[0]
    return SIR_ODEParams(
        beta=jnp.asarray(strain.r0 / strain.infectious_period),
        gamma=jnp.asarray(1.0 / strain.infectious_period),
        contact_matrix=tp.contact_matrix,
    )


def sir_ode(t, state: CompartmentState, p: SIR_ODEParams) -> CompartmentGradients:
    s, i, r = state
    n = s + i + r
    foi = p.beta * jnp.sum(p.contact_matrix * i / n, axis=1)
    s_to_i = s * foi
    i_to_r = p.gamma * i
    return (-s_to_i, s_to_i - i_to_r, i_to_r)


def run_simulation(config: SimulationConfig, tf) -> Solution:
    return simulate(
        ode=sir_ode,
        duration_days=tf,
        initial_state=config.initializer.get_initial_state(),
        ode_parameters=get_odeparams(config),
        solver_parameters=config.parameters.solver_params,
    )


if __name__ == "__main__":
    config = get_config()
    sol = run_simulation(config, 150)
    s, i, r = sol.ys
    for idx, label in enumerate(["Young", "Old"]):
        plt.plot(sol.ts, s[:, idx], label=f"S ({label})")
        plt.plot(sol.ts, i[:, idx], label=f"I ({label})")
        plt.plot(sol.ts, r[:, idx], label=f"R ({label})")
    plt.xlabel("Days")
    plt.ylabel("Population")
    plt.legend()
    plt.title("Age-Stratified SIR (dynode_tpu)")
    plt.savefig("sir_age_stratified.png", dpi=100)
    print("final I by age:", [float(v) for v in i[-1]])
