"""Multi-strain age-stratified SEIRS: the flagship benchmark workload.

Workload parity with the reference's
examples/seirs_multi_strain_age_stratified.py (same compartments s/e/i/r/c,
same defaults), but the RHS is written as one batched einsum over the
(age, strain) tensor instead of a per-strain Python loop -- the whole
force-of-infection computation is a single ``C @ (i/N)`` contraction that
XLA maps onto the MXU when the ensemble axis is batched in front.
"""

from datetime import date
from types import SimpleNamespace
from typing import Optional, Sequence

import jax
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
from ..utils import vectorize_objects


@pytree_dataclass(static_fieldnames=("idx",))
class MultiStrainParams(AbstractODEParams):
    """ODE parameter pytree of the multi-strain SEIRS model."""
    beta: jnp.ndarray  # (K,)
    sigma: jnp.ndarray  # (K,)
    gamma: jnp.ndarray  # (K,)
    omega: jnp.ndarray  # (K,)
    contact_matrix: jnp.ndarray  # (A, A)
    idx: Optional[SimpleNamespace] = None


def multistrain_ode(t, state: CompartmentState, p: MultiStrainParams):
    """Batched-tensor RHS: foi[a,k] = beta[k] * (C @ (i/N))[a,k].

    state: s (A,), e/i/r/c (A, K).
    """
    s, e, i, r, c = state
    n_age = s + e.sum(axis=-1) + i.sum(axis=-1) + r.sum(axis=-1)
    infectious_frac = i / n_age[:, None]  # (A, K)
    # full-f32 contraction: TPU matmuls default to bf16 MXU passes, a
    # measured ~2e-3 relative drift on the SEIP path (probes/probe_seip_kernel3.py);
    # these A x A contractions are tiny, so HIGHEST costs nothing
    foi = p.beta[None, :] * jnp.matmul(
        p.contact_matrix, infectious_frac, precision=jax.lax.Precision.HIGHEST
    )  # (A, K)
    new_inf = foi * s[:, None]  # (A, K)
    ds = -new_inf.sum(axis=-1) + (p.omega * r).sum(axis=-1)
    de = new_inf - p.sigma * e
    di = p.sigma * e - p.gamma * i
    dr = p.gamma * i - p.omega * r
    dc = new_inf
    return (ds, de, di, dr, dc)


class MultiStrainInitializer(Initializer):
    """Distributes initial infections across strains proportional to r0."""

    s0_prop: float = 0.99
    i0_prop: float = 0.01
    age_demographics: Sequence[float] = (0.75, 0.25)

    def get_initial_state(self, config: SimulationConfig, **kwargs) -> CompartmentState:
        """Initial (S, E, I, R, C) compartments from demographics and seeds."""
        demo = jnp.asarray(self.age_demographics)
        s0 = self.population_size * self.s0_prop * demo
        e0 = jnp.zeros(config.get_compartment("e").shape)
        r0s = jnp.asarray(
            vectorize_objects(
                config.parameters.transmission_params.strains, target="r0"
            )
        )
        dominance = r0s / jnp.sum(r0s)
        i0 = self.population_size * self.i0_prop * demo[:, None] * dominance
        r0 = jnp.zeros(config.get_compartment("r").shape)
        c0 = jnp.zeros(config.get_compartment("c").shape)
        return (s0, e0, i0, r0, c0)


def multistrain_config(
    r0s=(2.0, 2.5, 1.8),
    infectious_periods=(7.0, 6.0, 8.0),
    latent_periods=(3.0, 2.5, 4.0),
    waning_periods=(60.0, 80.0, 50.0),
    strain_names=("A", "B", "C"),
    age_names=("young", "old"),
    age_demographics=(0.75, 0.25),
    contact_matrix=None,
    solver_params: Optional[SolverParams] = None,
) -> SimulationConfig:
    """Age x strain SEIRS+C config, generalized to any strain/age count."""
    strains = [
        Strain(
            strain_name=name,
            r0=r0s[k],
            infectious_period=infectious_periods[k],
            exposed_to_infectious=latent_periods[k],
        )
        for k, name in enumerate(strain_names)
    ]
    age_dim = Dimension(name="age", bins=[Bin(name=a) for a in age_names])
    strain_dim = Dimension(
        name="strain", bins=[Bin(name=s.strain_name) for s in strains]
    )
    if contact_matrix is None:
        a = len(age_names)
        contact_matrix = jnp.full((a, a), 0.3) + 0.4 * jnp.eye(a)
    interactions = {
        s1: {s2: 1.0 for s2 in strain_names} for s1 in strain_names
    }
    return SimulationConfig(
        compartments=[
            Compartment(name="s", dimensions=[age_dim]),
            Compartment(name="e", dimensions=[age_dim, strain_dim]),
            Compartment(name="i", dimensions=[age_dim, strain_dim]),
            Compartment(name="r", dimensions=[age_dim, strain_dim]),
            Compartment(name="c", dimensions=[age_dim, strain_dim]),
        ],
        initializer=MultiStrainInitializer(
            description="age x strain SEIRS initializer",
            initialize_date=date(2022, 2, 11),
            population_size=1000,
            age_demographics=age_demographics,
        ),
        parameters=Params(
            solver_params=solver_params or SolverParams(step_budget=512),
            transmission_params=TransmissionParams(
                strains=strains,
                strain_interactions=interactions,
                contact_matrix=jnp.asarray(contact_matrix),
                waning_period=tuple(waning_periods),
            ),
        ),
    )


def multistrain_odeparams(config: SimulationConfig) -> MultiStrainParams:
    """Vectorize a (possibly sampled) config into strain-axis tensors."""
    tp = config.parameters.transmission_params
    r0s = jnp.asarray(vectorize_objects(tp.strains, target="r0"))
    inf_p = jnp.asarray(vectorize_objects(tp.strains, target="infectious_period"))
    lat_p = jnp.asarray(
        vectorize_objects(tp.strains, target="exposed_to_infectious")
    )
    return MultiStrainParams(
        beta=r0s / inf_p,
        sigma=1.0 / lat_p,
        gamma=1.0 / inf_p,
        omega=1.0 / jnp.asarray(tp.waning_period),
        contact_matrix=tp.contact_matrix,
        idx=config.idx,
    )


def multistrain_initial_state(config: SimulationConfig) -> CompartmentState:
    """Initial compartment tuple for a ``multistrain_config`` config."""
    return config.initializer.get_initial_state(config)


# ---------------------------------------------------------------------------
# lane-major ensemble variant: batch axis LAST. NOTE (round-2 honest
# timing): batch-leading jit(vmap) is FASTER for this small-state model --
# XLA flattens its elementwise ops across the batch; the batch-last layout
# only wins on scatter-heavy models (see simulation.ensemble_rhs). Kept as
# the template for ensemble_rhs equivalence tests and the NUTS
# batched-potential path.
# ---------------------------------------------------------------------------


def multistrain_ensemble_state(y0: CompartmentState, batch: int) -> CompartmentState:
    """Broadcast a single initial state to (..., batch)."""
    import jax.numpy as _jnp

    return tuple(
        _jnp.broadcast_to(a[..., None], a.shape + (batch,)) for a in y0
    )


def multistrain_ensemble_params(
    base: MultiStrainParams, beta_scales: jnp.ndarray
) -> MultiStrainParams:
    """Per-member transmission scaling: beta becomes (K, B)."""
    return base.replace(beta=base.beta[:, None] * beta_scales[None, :])


def multistrain_ode_ensemble(t, state: CompartmentState, p: MultiStrainParams):
    """Fused multi-strain RHS over a trailing ensemble axis.

    state: s (A, B), e/i/r/c (A, K, B); ``p.beta`` is (K, B).
    """
    s, e, i, r, c = state
    n_age = s + e.sum(axis=1) + i.sum(axis=1) + r.sum(axis=1)  # (A, B)
    infectious_frac = i / n_age[:, None, :]  # (A, K, B)
    mixed = jnp.einsum(
        "ab,bkx->akx", p.contact_matrix, infectious_frac,
        precision=jax.lax.Precision.HIGHEST,
    )
    foi = p.beta[None, :, :] * mixed  # (A, K, B)
    new_inf = foi * s[:, None, :]
    ds = -new_inf.sum(axis=1) + (p.omega[:, None] * r).sum(axis=1)
    de = new_inf - p.sigma[:, None] * e
    di = p.sigma[:, None] * e - p.gamma[:, None] * i
    dr = p.gamma[:, None] * i - p.omega[:, None] * r
    return (ds, de, di, dr, new_inf)


__all__ = [
    "MultiStrainParams",
    "multistrain_ode",
    "MultiStrainInitializer",
    "multistrain_config",
    "multistrain_odeparams",
    "multistrain_initial_state",
]
