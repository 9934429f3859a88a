"""Record compartment snapshots as deterministic trace sites.

(reference: src/dynode/infer/checkpointing.py:12-47). "Checkpointing" here
means observability -- named sites in the inference trace at chosen dates --
not solver-state resume (sampler state lives in
``InferenceProcess._inference_state`` for warm restarts).
"""

import datetime
from typing import List

from ..config import SimulationConfig
from ..ode import Solution
from ..utils import date_to_sim_day
from . import handlers


def checkpoint_compartment_sizes(
    config: SimulationConfig,
    solution: Solution,
    save_final_timesteps: bool = True,
    compartment_save_dates: List[datetime.date] = [],
):
    """Record compartment sizes at key dates for later debugging.

    Final-timestep sites are named ``final_timestep_{compartment}``; dated
    sites are ``{Y_m_d}_timestep_{compartment}``. Dates outside the solved
    range are silently skipped.
    """
    assert (
        solution.ys is not None
    ), "cannot checkpoint: the solve produced no saved states (solution.ys is None)"
    if save_final_timesteps:
        for name, idx in config.idx.__dict__.items():
            handlers.deterministic(
                "final_timestep_%s" % name, solution.ys[idx][-1]
            )
    for date in compartment_save_dates:
        date_str = date.strftime("%Y_%m_%d")
        sim_day = date_to_sim_day(date, config.initializer.initialize_date)
        if 0 <= sim_day < len(solution.ys[0]):
            for name, idx in config.idx.__dict__.items():
                handlers.deterministic(
                    f"{date_str}_timestep_{name}", solution.ys[idx][sim_day]
                )


__all__ = ["checkpoint_compartment_sizes"]
