"""Bins and Dimensions: the axis vocabulary of compartment tensors.

Behavioral contract mirrors the reference's bin/dimension layer
(reference: src/dynode/config/bins.py:16-89 and config/dimension.py:23-244):
bins are the atomic cells of an axis; dimensions are named, validated lists
of same-typed bins with an ``idx`` namespace for readable indexing.
"""

import math
from itertools import combinations
from types import SimpleNamespace
from typing import TYPE_CHECKING, List

from pydantic import (
    BaseModel,
    Field,
    NonNegativeFloat,
    NonNegativeInt,
    PositiveFloat,
    field_validator,
    model_validator,
)

from ..typing import DynodeName, UnitIntervalFloat

if TYPE_CHECKING:  # pragma: no cover - import cycle guard (strains uses AgeBin)
    from .strains import Strain

# ---------------------------------------------------------------------------
# Bins
# ---------------------------------------------------------------------------


class Bin(BaseModel):
    """One cell of a dimension (e.g. an age band, a waning stage)."""

    name: DynodeName = Field(
        description="Bin name; unique within its dimension, attribute-safe."
    )


class DiscretizedPositiveIntBin(Bin):
    """A bin covering the inclusive integer range [min_value, max_value]."""

    min_value: NonNegativeInt
    max_value: NonNegativeInt

    def __init__(self, min_value, max_value, name=None):
        """Default the bin name to ``range_{min}_{max}`` when not given."""
        if name is None:
            name = f"range_{min_value}_{max_value}"
        super().__init__(name=name, min_value=min_value, max_value=max_value)

    @model_validator(mode="after")
    def _check_ordering(self):
        assert self.min_value <= self.max_value
        return self


class AgeBin(DiscretizedPositiveIntBin):
    """Integer age band; auto-named ``a{min}_{max}``."""

    def __init__(self, min_value, max_value, name=None):
        if name is None:
            name = f"a{min_value}_{max_value}"
        super().__init__(name=name, min_value=min_value, max_value=max_value)


class WaneBin(Bin):
    """A waning stage with mean residence time and retained protection."""

    waiting_time: PositiveFloat = Field(
        description="Mean days spent in the bin before waning onward; "
        "math.inf means the population never wanes out."
    )
    base_protection: NonNegativeFloat = Field(
        le=1.0,
        description="Fraction of immune protection retained in this bin.",
    )


# ---------------------------------------------------------------------------
# Dimensions
# ---------------------------------------------------------------------------


class Dimension(BaseModel):
    """A named axis of a compartment tensor, composed of bins."""

    name: DynodeName
    bins: List[Bin]

    def __len__(self):
        return len(self.bins)

    @property
    def idx(self) -> SimpleNamespace:
        """Namespace mapping each bin name to its integer index."""
        ns = SimpleNamespace()
        for i, b in enumerate(self.bins):
            setattr(ns, b.name, i)
        return ns

    @field_validator("bins", mode="after")
    @classmethod
    def _bins_nonempty_and_homogeneous(cls, bins):
        assert len(bins) > 0, "can not have dimension with no bins"
        first_type = type(bins[0])
        assert all(type(b) is first_type for b in bins), (
            "can not instantiate dimension with mixed type bins. "
            f"Found list of types {[type(b) for b in bins]}"
        )
        return bins

    @field_validator("bins", mode="after")
    @classmethod
    def _bin_names_unique(cls, bins):
        names = [b.name for b in bins]
        assert len(set(names)) == len(names), (
            "Dimension of categorical bins must have unique bin names."
        )
        return bins

    @field_validator("bins", mode="after")
    @classmethod
    def _int_bins_sorted_disjoint(cls, bins):
        if bins and all(isinstance(b, DiscretizedPositiveIntBin) for b in bins):
            in_order = sorted(bins, key=lambda b: b.min_value)
            assert bins == in_order, (
                "Any dimension made up of DiscretizedIntBins must be sorted, "
                f"got {bins}"
            )
            assert all(
                bins[i].max_value < bins[i + 1].min_value
                for i in range(len(bins) - 1)
            ), "DiscretizedPositiveIntBin within a dimension can not overlap."
        return bins

    @field_validator("bins", mode="after")
    @classmethod
    def _int_bins_gapless(cls, bins):
        if bins and all(isinstance(b, DiscretizedPositiveIntBin) for b in bins):
            for left, right in zip(bins, bins[1:]):
                assert left.max_value + 1 == right.min_value, (
                    "dimensions containing DiscretizedPositiveIntBin can not "
                    f"have gaps between them, found one between {left} and {right}"
                )
        return bins


class VaccinationDimension(Dimension):
    """Ordinal vaccine-dose axis ``v0..vK``, optionally with a seasonal dose.

    (reference: src/dynode/config/dimension.py:110-147)
    """

    seasonal_vaccination: bool = Field(default=False)

    def __init__(
        self,
        max_ordinal_vaccinations: int,
        seasonal_vaccination: bool = False,
        name: DynodeName = "vax",
    ):
        doses = max_ordinal_vaccinations + (1 if seasonal_vaccination else 0)
        bins: list = [
            DiscretizedPositiveIntBin(name=f"v{k}", min_value=k, max_value=k)
            for k in range(doses + 1)
        ]
        super().__init__(name=name, bins=bins)
        self.seasonal_vaccination = seasonal_vaccination

    @property
    def max_shots(self) -> int:
        """Highest tracked dose count (the v0 bin is not a shot)."""
        return len(self.bins) - 1


class ImmuneHistoryDimension(Dimension):
    """Marker base class for axes tracking post-infection immunity."""


class FullStratifiedImmuneHistoryDimension(ImmuneHistoryDimension):
    """All 2^N subsets of strains ever recovered from, plus ``none``.

    (reference: src/dynode/config/dimension.py:150-174)
    """

    def __init__(self, strains: List["Strain"], name: DynodeName = "hist") -> None:
        assert len(strains) > 0, (
            "Must pass at least one strain to immune history dimension."
        )
        names = [s.strain_name for s in strains]
        bins = [Bin(name="none")]
        for size in range(1, len(names) + 1):
            bins.extend(Bin(name="_".join(c)) for c in combinations(names, size))
        super().__init__(name=name, bins=bins)


class LastStrainImmuneHistoryDimension(ImmuneHistoryDimension):
    """Only the most recent infecting strain is tracked (N+1 bins).

    (reference: src/dynode/config/dimension.py:177-190)
    """

    def __init__(self, strains: List["Strain"], name: DynodeName = "hist") -> None:
        assert len(strains) > 0, (
            "Must pass at least one strain to immune history dimension."
        )
        bins = [Bin(name="none")] + [Bin(name=s.strain_name) for s in strains]
        super().__init__(name=name, bins=bins)


class WaneDimension(Dimension):
    """Waning chain ``W0..Wn``; the final bin must never wane (inf wait).

    (reference: src/dynode/config/dimension.py:193-244)
    """

    def __init__(
        self,
        waiting_times: List[PositiveFloat],
        base_protections: List[UnitIntervalFloat],
        name="wane",
    ):
        assert len(waiting_times) > 0, "Wane dimension must have at least one bin."
        assert len(waiting_times) == len(base_protections), (
            "must pass equal length wait times and base protections"
        )
        bins: list = [
            WaneBin(name=f"W{i}", waiting_time=w, base_protection=p)
            for i, (w, p) in enumerate(zip(waiting_times, base_protections))
        ]
        super().__init__(name=name, bins=bins)

    @model_validator(mode="after")
    def _last_bin_never_wanes(self):
        last = self.bins[-1]
        assert isinstance(last, WaneBin)
        assert math.isinf(last.waiting_time), (
            "last wane bin should have math.inf waiting time"
        )
        return self


__all__ = [
    "Bin",
    "DiscretizedPositiveIntBin",
    "AgeBin",
    "WaneBin",
    "Dimension",
    "VaccinationDimension",
    "ImmuneHistoryDimension",
    "FullStratifiedImmuneHistoryDimension",
    "LastStrainImmuneHistoryDimension",
    "WaneDimension",
]
