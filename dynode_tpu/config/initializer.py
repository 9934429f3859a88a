"""Abstract Initializer: produces the t=0 compartment state.

(reference: src/dynode/config/initializer.py:12-47). Users subclass and
implement ``get_initial_state`` for their data streams; see
``dynode_tpu.models`` and the examples for concrete patterns.
"""

from datetime import date

from pydantic import BaseModel, Field, PositiveInt

from ..typing import CompartmentState


class Initializer(BaseModel):
    """Builds the initial CompartmentState of an ODE model."""

    description: str = Field(
        description="What data streams / date range this initializer covers."
    )
    initialize_date: date = Field(description="Initialization date (sim day 0).")
    population_size: PositiveInt = Field(
        description="Target total population at t=0."
    )

    def get_initial_state(self, **kwargs) -> CompartmentState:
        """Return one jax array per compartment, summing to population_size.

        Raises
        ------
        NotImplementedError
            Subclasses must implement this for their data streams.
        """
        raise NotImplementedError(
            "implement functionality to get initial state"
        )


__all__ = ["Initializer"]
