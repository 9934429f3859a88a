"""Minimal SIR example: config -> initializer -> simulate -> plot.

Workload parity with the reference's examples/sir.py (same parameters),
written against the dynode_tpu API.
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

from datetime import date

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


class SimpleSIRInitializer(Initializer):
    def __init__(self):
        super().__init__(
            description="Simple SIR initializer",
            initialize_date=date(2022, 2, 11),
            population_size=1,
        )

    def get_initial_state(self, s_0=0.9, i_0=0.1, r_0=0.0, **kwargs) -> CompartmentState:
        return (jnp.array([s_0]), jnp.array([i_0]), jnp.array([r_0]))


def get_config(r_0=2.0, infectious_period=7.0) -> SimulationConfig:
    dim = Dimension(name="age", bins=[Bin(name="all")])
    return SimulationConfig(
        compartments=[
            Compartment(name="s", dimensions=[dim]),
            Compartment(name="i", dimensions=[dim]),
            Compartment(name="r", dimensions=[dim]),
        ],
        initializer=SimpleSIRInitializer(),
        parameters=Params(
            solver_params=SolverParams(),
            transmission_params=TransmissionParams(
                strains=[
                    Strain(
                        strain_name="test",
                        r0=r_0,
                        infectious_period=infectious_period,
                    )
                ],
                strain_interactions={"test": {"test": 1.0}},
                contact_matrix=jnp.array([[1.0]]),
            ),
        ),
    )


@pytree_dataclass
class SIR_ODEParams(AbstractODEParams):
    beta: jnp.ndarray
    gamma: jnp.ndarray


def sir_ode(t, state: CompartmentState, p: SIR_ODEParams):
    s, i, r = state
    n = s + i + r
    flow = p.beta * s * i / n
    return (-flow, flow - p.gamma * i, p.gamma * i)


def get_odeparams(config: SimulationConfig) -> SIR_ODEParams:
    strain = config.parameters.transmission_params.strains[0]
    return SIR_ODEParams(
        beta=jnp.asarray(strain.r0 / strain.infectious_period),
        gamma=jnp.asarray(1.0 / strain.infectious_period),
    )


if __name__ == "__main__":
    config = get_config()
    sol = simulate(
        ode=sir_ode,
        duration_days=150,
        initial_state=config.initializer.get_initial_state(),
        ode_parameters=get_odeparams(config),
        solver_parameters=config.parameters.solver_params,
    )
    s, i, r = [arr.squeeze() for arr in sol.ys]
    plt.plot(sol.ts, s, label="Susceptible")
    plt.plot(sol.ts, i, label="Infectious")
    plt.plot(sol.ts, r, label="Recovered")
    plt.xlabel("Days")
    plt.ylabel("Population")
    plt.legend()
    plt.title("Simple SIR Model (dynode_tpu)")
    plt.savefig("sir_example.png", dpi=100)
    print("final S/I/R:", float(s[-1]), float(i[-1]), float(r[-1]))
    print("saved sir_example.png")
