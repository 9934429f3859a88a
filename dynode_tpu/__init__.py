"""DynODE-TPU: a TPU-native compartmental-ODE scenario engine in JAX.

A from-scratch rebuild of the capabilities of CDCgov/DynODE
(reference: /root/reference/src/dynode/__init__.py:1-9) designed TPU-first:

- The ODE engine (``dynode_tpu.ode``) compiles an entire adaptive solve into a
  single XLA program via a bounded, checkpointed ``lax.scan`` so it is
  reverse-mode differentiable (NUTS gradients flow through the solver) and
  vmappable over thousands of parameter draws.
- The inference engine (``dynode_tpu.infer``) is a self-contained numpyro-like
  probabilistic layer: distributions, effect handlers, iterative NUTS with
  windowed warmup adaptation, SVI with autoguides, and Predictive replay --
  with chains run as a vectorized batch axis shardable over a TPU mesh.
- ``dynode_tpu.parallel`` owns device-mesh construction and sharding helpers
  (chain/ensemble axes) -- the TPU-native counterpart of the reference's
  (nonexistent) distributed backend.
- ``dynode_tpu.ops`` holds Pallas TPU kernels for the hot, fused
  right-hand-side evaluations of large stratified models.

The public API mirrors the reference's five module layers: ``config``,
``simulation``, ``infer``, ``typing``, ``utils``.
"""

from . import (
    config,
    dist,
    infer,
    ode,
    parallel,
    simulation,
    utils,
)
from .config import (
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
from .infer import (
    InferenceProcess,
    MCMCProcess,
    SVIProcess,
    checkpoint_compartment_sizes,
    resolve_deterministic,
    sample_distributions,
    sample_then_resolve,
)
from .simulation import AbstractODEParams, simulate
from .struct import pytree_dataclass

__version__ = "0.1.0"

__all__ = [
    "config",
    "dist",
    "infer",
    "ode",
    "parallel",
    "simulation",
    "utils",
    "Bin",
    "Compartment",
    "Dimension",
    "Initializer",
    "Params",
    "SimulationConfig",
    "SolverParams",
    "Strain",
    "TransmissionParams",
    "InferenceProcess",
    "MCMCProcess",
    "SVIProcess",
    "checkpoint_compartment_sizes",
    "resolve_deterministic",
    "sample_distributions",
    "sample_then_resolve",
    "AbstractODEParams",
    "simulate",
    "pytree_dataclass",
]
