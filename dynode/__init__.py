"""Compatibility alias: ``import dynode`` maps onto :mod:`dynode_tpu`.

Lets model code written against the reference's module paths
(``from dynode.config import Strain``, ``from dynode.simulation import
simulate``, ``from dynode.infer import MCMCProcess``, ...) run unchanged on
this framework. The only source changes a reference user needs are the
backend imports the reference takes from third parties (numpyro
distributions -> ``dynode.dist``, diffrax solvers -> ``dynode.ode``, chex
dataclasses -> ``dynode.struct.pytree_dataclass``).
"""

import sys

import dynode_tpu as _impl

for _sub in (
    "config",
    "simulation",
    "infer",
    "typing",
    "utils",
    "dist",
    "ode",
    "models",
    "parallel",
    "ops",
    "struct",
):
    _mod = __import__(f"dynode_tpu.{_sub}", fromlist=["__name__"])
    sys.modules[f"{__name__}.{_sub}"] = _mod
    globals()[_sub] = _mod

__all__ = list(_impl.__all__)
__version__ = _impl.__version__


def __getattr__(name):
    # forward everything else (lazily, so vis helpers don't pull matplotlib
    # in at import time)
    return getattr(_impl, name)
