"""Simulation layer: the `simulate()` entry point over the TPU ODE engine.

(reference: src/dynode/simulation/__init__.py:3-8)
"""

from .odes import (
    AbstractODEParams,
    build_saveat,
    simulate,
    simulate_ensemble,
    tune_step_budget,
)

__all__ = [
    "simulate",
    "simulate_ensemble",
    "build_saveat",
    "AbstractODEParams",
    "tune_step_budget",
]
