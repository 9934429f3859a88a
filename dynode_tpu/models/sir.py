"""SIR model family: scalar and age-stratified.

Workload parity with the reference's examples/sir.py and
examples/sir_age_stratified.py (same parameter defaults so closed-form
oracles and golden trajectories line up).
"""

from datetime import date
from typing import Optional, Sequence

import jax.numpy as jnp

from ..config import (
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
from ..simulation import AbstractODEParams
from ..struct import pytree_dataclass
from ..typing import CompartmentState


@pytree_dataclass
class SIRParams(AbstractODEParams):
    """beta = r0/infectious_period, gamma = 1/infectious_period."""

    beta: jnp.ndarray
    gamma: jnp.ndarray
    contact_matrix: jnp.ndarray


def sir_ode(t, state: CompartmentState, p: SIRParams):
    """FOI = beta * sum_j C[a,j] i_j / N_j; works for any age count."""
    s, i, r = state
    n = s + i + r
    foi = p.beta * jnp.sum(p.contact_matrix * (i / n), axis=-1)
    s_to_i = s * foi
    i_to_r = p.gamma * i
    return (-s_to_i, s_to_i - i_to_r, i_to_r)


class ProportionInitializer(Initializer):
    """Splits population_size across age demographics and S/I proportions."""

    s0_prop: float = 0.99
    i0_prop: float = 0.01
    age_demographics: Sequence[float] = (1.0,)

    def get_initial_state(self, **kwargs) -> CompartmentState:
        """Initial (S, I, R) from proportions and demographics."""
        demo = jnp.asarray(self.age_demographics)
        s0 = self.population_size * self.s0_prop * demo
        i0 = self.population_size * self.i0_prop * demo
        return (s0, i0, jnp.zeros_like(s0))


def sir_config(
    r_0=2.0,
    infectious_period=7.0,
    solver_params: Optional[SolverParams] = None,
) -> SimulationConfig:
    """Single-bin SIR (reference workload: examples/sir.py)."""
    dim = Dimension(name="age", bins=[Bin(name="all")])
    return SimulationConfig(
        compartments=[
            Compartment(name="s", dimensions=[dim]),
            Compartment(name="i", dimensions=[dim]),
            Compartment(name="r", dimensions=[dim]),
        ],
        initializer=ProportionInitializer(
            description="simple SIR proportions",
            initialize_date=date(2022, 2, 11),
            population_size=1,
            s0_prop=0.9,
            i0_prop=0.1,
        ),
        parameters=Params(
            solver_params=solver_params or SolverParams(step_budget=512),
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


def sir_age_config(
    r_0=2.0,
    infectious_period=7.0,
    solver_params: Optional[SolverParams] = None,
) -> SimulationConfig:
    """Two-age-group SIR with a spectral-radius-normalized contact matrix
    (reference workload: examples/sir_age_stratified.py)."""
    contact = jnp.array([[0.7, 0.3], [0.3, 0.7]])
    contact = contact / jnp.max(jnp.real(jnp.linalg.eigvals(contact)))
    dim = Dimension(name="age", bins=[Bin(name="young"), Bin(name="old")])
    return SimulationConfig(
        compartments=[
            Compartment(name="s", dimensions=[dim]),
            Compartment(name="i", dimensions=[dim]),
            Compartment(name="r", dimensions=[dim]),
        ],
        initializer=ProportionInitializer(
            description="age-stratified SIR proportions",
            initialize_date=date(2022, 2, 11),
            population_size=1000,
            s0_prop=0.99,
            i0_prop=0.01,
            age_demographics=(0.75, 0.25),
        ),
        parameters=Params(
            solver_params=solver_params or SolverParams(step_budget=512),
            transmission_params=TransmissionParams(
                strains=[
                    Strain(
                        strain_name="swo9",
                        r0=r_0,
                        infectious_period=infectious_period,
                    )
                ],
                strain_interactions={"swo9": {"swo9": 1.0}},
                contact_matrix=contact,
            ),
        ),
    )


__all__ = ["SIRParams", "sir_ode", "sir_config", "sir_age_config", "ProportionInitializer"]
