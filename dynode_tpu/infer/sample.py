"""Recursive sampling/resolution of Distribution and DeterministicParameter.

The object->tensor bridge at the top of every model's ``get_odeparams``:
walks arbitrarily nested dicts/pydantic models/lists, sampling Distribution
leaves as named sites and resolving DeterministicParameter links, with the
exact site-naming convention of the reference (path segments joined by
underscores, e.g. ``strains_0_r0`` -- reference: src/dynode/infer/sample.py:18-197
and examples/sir_infer_parameters.py:127).
"""

from copy import deepcopy
from typing import Any, Optional, Union

import numpy as np
from jax import Array
from pydantic import BaseModel

from ..config import DeterministicParameter
from ..dist import Distribution
from . import handlers


def sample_distributions(
    obj: Any, rng_key: Optional[Array] = None, _prefix: str = ""
):
    """Recursively replace every Distribution in ``obj`` with a named sample.

    Naming rules: dict/pydantic fields append ``{key}_``; list/array elements
    append ``{i}_``; the trailing underscore is stripped at the leaf. If
    ``obj`` itself is a Distribution its sample is returned directly.
    """
    if isinstance(obj, (BaseModel, dict)):
        as_dict = dict(obj)
        for key, value in as_dict.items():
            as_dict[key] = sample_distributions(
                value, rng_key=rng_key, _prefix=f"{_prefix}{key}_"
            )
        return as_dict if isinstance(obj, dict) else obj.__class__(**as_dict)
    if isinstance(obj, (np.ndarray, list)):
        return [
            sample_distributions(item, rng_key=rng_key, _prefix=f"{_prefix}{i}_")
            for i, item in enumerate(obj)
        ]
    if isinstance(obj, Distribution):
        site = _prefix[:-1] if _prefix else _prefix
        return handlers.sample(site, obj, rng_key=rng_key)
    return obj


def resolve_deterministic(
    obj: Any, root_params: Union[dict, BaseModel], _prefix: str = ""
):
    """Recursively resolve DeterministicParameter links against ``root_params``.

    Each resolved value is recorded as a deterministic trace site under the
    same path-joined name the sampler would have used. Dependencies must be
    top-level keys of ``root_params``.
    """
    if isinstance(root_params, BaseModel):
        root_params = dict(root_params)
    if isinstance(obj, (BaseModel, dict)):
        as_dict = dict(obj)
        for key, value in as_dict.items():
            as_dict[key] = resolve_deterministic(
                value, root_params, _prefix=f"{_prefix}{key}_"
            )
        return as_dict if isinstance(obj, dict) else obj.__class__(**as_dict)
    if isinstance(obj, (np.ndarray, list)):
        return [
            resolve_deterministic(item, root_params, _prefix=f"{_prefix}{i}_")
            for i, item in enumerate(obj)
        ]
    if isinstance(obj, DeterministicParameter):
        site = _prefix[:-1] if _prefix else _prefix
        return handlers.deterministic(site, obj.resolve(root_params))
    return obj


def sample_then_resolve(
    parameters: Any, rng_key: Optional[Array] = None, _prefix: str = ""
):
    """deepcopy -> sample -> resolve; returns a fully concrete copy.

    The deepcopy keeps vectorized/parallel chains from sharing mutable
    config state (same rationale as the reference:
    src/dynode/infer/sample.py:190, docs inference.md:128).
    """
    parameters = deepcopy(parameters)
    parameters = sample_distributions(parameters, rng_key=rng_key, _prefix=_prefix)
    parameters = resolve_deterministic(
        parameters, root_params=dict(parameters), _prefix=_prefix
    )
    return parameters


__all__ = ["sample_distributions", "resolve_deterministic", "sample_then_resolve"]
