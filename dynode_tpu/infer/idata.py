"""InferenceData: a lightweight arviz-style container for fit results.

Standalone replacement for the arviz export path of the reference
(src/dynode/infer/inference.py:208-241 -> ``az.from_numpyro``). Groups are
plain dicts of numpy arrays with arviz's shape conventions:
posterior/sample_stats are ``(chains, draws, *shape)``; prior and
posterior_predictive are ``(draws, *shape)``.
"""

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np


def _np_group(group: Optional[Dict[str, Any]]) -> Optional[Dict[str, np.ndarray]]:
    if group is None:
        return None
    return {k: np.asarray(v) for k, v in group.items()}


@dataclass
class InferenceData:
    """Grouped fit results with summary/diagnostic helpers."""

    posterior: Optional[Dict[str, np.ndarray]] = None
    posterior_predictive: Optional[Dict[str, np.ndarray]] = None
    prior: Optional[Dict[str, np.ndarray]] = None
    sample_stats: Optional[Dict[str, np.ndarray]] = None
    log_likelihood: Optional[Dict[str, np.ndarray]] = None
    observed_data: Optional[Dict[str, np.ndarray]] = None
    attrs: Dict[str, Any] = field(default_factory=dict)

    def groups(self):
        return [
            name
            for name in (
                "posterior",
                "posterior_predictive",
                "prior",
                "sample_stats",
                "log_likelihood",
                "observed_data",
            )
            if getattr(self, name) is not None
        ]

    def summary(self, prob: float = 0.9):
        """Per-parameter mean/std/HDI/ESS/Rhat over the posterior group."""
        from .diagnostics import summary as _summary

        assert self.posterior is not None, "no posterior group"
        return _summary(self.posterior, prob=prob)

    def __repr__(self):
        lines = ["InferenceData with groups:"]
        for g in self.groups():
            sites = getattr(self, g)
            lines.append(f"  > {g}: {list(sites.keys())}")
        return "\n".join(lines)

    def to_npz(self, path: str) -> None:
        """Persist all groups to one ``.npz`` (arviz ``to_netcdf`` analog).

        Keys are ``{group}/{site}``; dependency-free and loadable with
        plain numpy or :meth:`from_npz`.
        """
        arrays = {}
        for g in self.groups():
            for site, arr in getattr(self, g).items():
                arrays[f"{g}/{site}"] = np.asarray(arr)
        np.savez_compressed(path, **arrays)

    @classmethod
    def from_npz(cls, path: str) -> "InferenceData":
        """Inverse of :meth:`to_npz`."""
        groups: Dict[str, Dict[str, np.ndarray]] = {}
        with np.load(path) as data:
            for key in data.files:
                g, site = key.split("/", 1)
                groups.setdefault(g, {})[site] = data[key]
        return cls(**groups)


def from_dynode(
    *,
    posterior: Optional[Dict[str, Any]] = None,
    posterior_predictive: Optional[Dict[str, Any]] = None,
    prior: Optional[Dict[str, Any]] = None,
    sample_stats: Optional[Dict[str, Any]] = None,
    log_likelihood: Optional[Dict[str, Any]] = None,
    observed_data: Optional[Dict[str, Any]] = None,
    **attrs,
) -> InferenceData:
    """Assemble an InferenceData from raw sample dicts (device arrays ok)."""
    return InferenceData(
        posterior=_np_group(posterior),
        posterior_predictive=_np_group(posterior_predictive),
        prior=_np_group(prior),
        sample_stats=_np_group(sample_stats),
        log_likelihood=_np_group(log_likelihood),
        observed_data=_np_group(observed_data),
        attrs=dict(attrs),
    )


__all__ = ["InferenceData", "from_dynode"]
