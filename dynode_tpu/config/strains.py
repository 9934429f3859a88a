"""Strain: the per-variant epidemiological parameter record.

Field-for-field parity with the reference Strain
(reference: src/dynode/config/strains.py:22-109). Fields are polymorphic:
plain floats/arrays for fixed values, :class:`dynode_tpu.dist.Distribution`
for priors to be sampled, or :class:`DeterministicParameter` for values
linked to other sites -- resolved by ``dynode_tpu.infer.sample_then_resolve``.
"""

from datetime import date
from typing import List, Optional, Union

from jax.typing import ArrayLike
from pydantic import (
    BaseModel,
    ConfigDict,
    Field,
    NonNegativeFloat,
    PositiveFloat,
)

from ..dist import Distribution
from ..typing import DynodeName
from .axes import AgeBin
from .links import DeterministicParameter


class Strain(BaseModel):
    """A pathogen variant, optionally introduced from an external population."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    strain_name: DynodeName = Field(
        description="Strain name, no leading numbers or special characters."
    )
    r0: Union[NonNegativeFloat, ArrayLike, Distribution, DeterministicParameter] = (
        Field(description="Reproduction number; transmission rate = r0/infectious_period.")
    )
    infectious_period: Union[PositiveFloat, ArrayLike, Distribution] = Field(
        description="Mean days an infectious person remains infectious."
    )
    exposed_to_infectious: Optional[PositiveFloat] = Field(
        default=None,
        description="Mean days from exposure until onward transmissibility "
        "(the E->I latent period); None for SIR-style models.",
    )
    vaccine_efficacy: Optional[dict[int, NonNegativeFloat]] = Field(
        default=None,
        description="Map of tracked dose count -> protection in [0,1] against "
        "infection by this strain, before waning.",
    )
    is_introduced: bool = Field(
        default=False,
        description="Whether this strain seeds into the tracked population "
        "from untracked external mixing during the simulation.",
    )
    introduction_time: Optional[
        Union[date, NonNegativeFloat, ArrayLike, Distribution, DeterministicParameter]
    ] = Field(
        default=None,
        description="Sim-day (or date/prior) of peak external infectious "
        "mixing; introductions use a normal-shaped pulse to stay smooth "
        "for the ODE solver. Only used when is_introduced.",
    )
    introduction_percentage: Optional[
        Union[PositiveFloat, ArrayLike, Distribution, DeterministicParameter]
    ] = Field(
        default=None,
        description="External population size relative to the tracked "
        "population (0.05 = 5 percent). Only used when is_introduced.",
    )
    introduction_scale: Optional[
        Union[PositiveFloat, ArrayLike, Distribution, DeterministicParameter]
    ] = Field(
        default=None,
        description="Stddev (days) of the normal-shaped mixing pulse around "
        "introduction_time. Only used when is_introduced.",
    )
    introduction_ages: Optional[List[AgeBin]] = Field(
        default=None,
        description="AgeBins describing the external population's age "
        "structure. Only used when is_introduced.",
    )
    introduction_ages_mask_vector: Optional[List[int]] = Field(
        default=None,
        description="PRIVATE: binary mask over the model's age bins, "
        "auto-populated by SimulationConfig validation from introduction_ages.",
    )


__all__ = ["Strain"]
