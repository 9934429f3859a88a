"""SIR stratified by age x risk group (rank-2 compartments).

Workload parity with the reference's examples/sir_age_risk_stratified.py:
the age x risk contact structure is a Kronecker product contracted against
the rank-2 infectious tensor in a single einsum.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

from datetime import date
from typing import List

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from dynode_tpu import pytree_dataclass, simulate
from dynode_tpu.config import (
    Bin,
    Compartment,
    Dimension,
    Initializer,
    Params,
    SimulationConfig,
    SolverParams,
    Strain,
    TransmissionParams,
)
from dynode_tpu.simulation import AbstractODEParams
from dynode_tpu.typing import CompartmentState

AGE_NAMES = ("young", "adult", "old")
RISK_NAMES = ("low", "high")


class AgeRiskInitializer(Initializer):
    """Field-style pydantic initializer splitting population over age x risk."""

    age_demographics: List[float] = [0.4, 0.4, 0.2]
    risk_split: List[float] = [0.8, 0.2]
    i0_prop: float = 0.01

    def get_initial_state(self, **kwargs) -> CompartmentState:
        demo = jnp.outer(
            jnp.asarray(self.age_demographics), jnp.asarray(self.risk_split)
        )
        total = self.population_size * demo
        i0 = self.i0_prop * total
        s0 = total - i0
        return (s0, i0, jnp.zeros_like(s0))


def get_config(
    r_0=2.0,
    infectious_period=7.0,
    n_age=3,
    n_risk=2,
) -> SimulationConfig:
    age_dim = Dimension(
        name="age", bins=[Bin(name=a) for a in AGE_NAMES[:n_age]]
    )
    risk_dim = Dimension(
        name="risk", bins=[Bin(name=r) for r in RISK_NAMES[:n_risk]]
    )
    dims = [age_dim, risk_dim]
    age_contact = jnp.full((n_age, n_age), 0.2) + 0.5 * jnp.eye(n_age)
    # high-risk mixes more within itself
    risk_contact = jnp.full((n_risk, n_risk), 0.4) + 0.6 * jnp.eye(n_risk)
    # kron contact: C[a,r,a',r'] = age_contact[a,a'] * risk_contact[r,r']
    contact = jnp.einsum("ij,kl->ikjl", age_contact, risk_contact)
    return SimulationConfig(
        compartments=[
            Compartment(name="s", dimensions=dims),
            Compartment(name="i", dimensions=dims),
            Compartment(name="r", dimensions=dims),
        ],
        initializer=AgeRiskInitializer(
            description="age x risk proportional initializer",
            initialize_date=date(2022, 2, 11),
            population_size=10000,
            age_demographics=[0.4, 0.4, 0.2][:n_age],
            risk_split=[0.8, 0.2][:n_risk],
        ),
        parameters=Params(
            solver_params=SolverParams(),
            transmission_params=TransmissionParams(
                strains=[
                    Strain(
                        strain_name="flu",
                        r0=r_0,
                        infectious_period=infectious_period,
                    )
                ],
                strain_interactions={"flu": {"flu": 1.0}},
                contact_matrix=contact,
            ),
        ),
    )


@pytree_dataclass
class AgeRiskParams(AbstractODEParams):
    beta: jnp.ndarray
    gamma: jnp.ndarray
    contact_matrix: jnp.ndarray  # (A, R, A, R)


def sir_age_risk_ode(t, state: CompartmentState, p: AgeRiskParams):
    s, i, r = state  # each (A, R)
    n = s + i + r
    # foi[a,r] = beta * sum_{a',r'} C[a,r,a',r'] * i[a',r'] / N[a',r']
    foi = p.beta * jnp.einsum("arkl,kl->ar", p.contact_matrix, i / n)
    s_to_i = s * foi
    i_to_r = p.gamma * i
    return (-s_to_i, s_to_i - i_to_r, i_to_r)


def get_odeparams(config: SimulationConfig) -> AgeRiskParams:
    strain = config.parameters.transmission_params.strains[0]
    return AgeRiskParams(
        beta=jnp.asarray(strain.r0 / strain.infectious_period),
        gamma=jnp.asarray(1.0 / strain.infectious_period),
        contact_matrix=config.parameters.transmission_params.contact_matrix,
    )


if __name__ == "__main__":
    config = get_config()
    sol = simulate(
        ode=sir_age_risk_ode,
        duration_days=200,
        initial_state=config.initializer.get_initial_state(),
        ode_parameters=get_odeparams(config),
        solver_parameters=config.parameters.solver_params,
    )
    s, i, r = sol.ys  # (T, A, R)
    for a, aname in enumerate(AGE_NAMES):
        for k, rname in enumerate(RISK_NAMES):
            plt.plot(sol.ts, i[:, a, k], label=f"I {aname}/{rname}")
    plt.legend()
    plt.xlabel("Days")
    plt.title("Age x Risk Stratified SIR (dynode_tpu)")
    plt.savefig("sir_age_risk.png", dpi=100)
    print("peak infectious by group:", jnp.max(i, axis=0))
