"""Dimension validation tests (spec: reference tests/test_config/test_dimension.py)."""

import math

import pytest

from dynode_tpu.config import (
    AgeBin,
    Bin,
    Dimension,
    DiscretizedPositiveIntBin,
    FullStratifiedImmuneHistoryDimension,
    LastStrainImmuneHistoryDimension,
    Strain,
    VaccinationDimension,
    WaneDimension,
)


def _strains(*names):
    return [
        Strain(strain_name=n, r0=2.0, infectious_period=7.0) for n in names
    ]


def test_len_and_idx():
    d = Dimension(name="age", bins=[Bin(name="young"), Bin(name="old")])
    assert len(d) == 2
    assert d.idx.young == 0 and d.idx.old == 1


def test_empty_bins_rejected():
    with pytest.raises(Exception):
        Dimension(name="age", bins=[])


def test_mixed_bin_types_rejected():
    with pytest.raises(Exception):
        Dimension(name="x", bins=[Bin(name="a"), AgeBin(0, 5)])


def test_duplicate_bin_names_rejected():
    with pytest.raises(Exception):
        Dimension(name="x", bins=[Bin(name="a"), Bin(name="a")])


def test_int_bins_must_be_sorted():
    with pytest.raises(Exception):
        Dimension(name="age", bins=[AgeBin(18, 64), AgeBin(0, 17)])


def test_int_bins_must_not_overlap():
    with pytest.raises(Exception):
        Dimension(name="age", bins=[AgeBin(0, 18), AgeBin(18, 64)])


def test_int_bins_must_be_gapless():
    with pytest.raises(Exception):
        Dimension(name="age", bins=[AgeBin(0, 17), AgeBin(19, 64)])


def test_valid_age_dimension():
    d = Dimension(name="age", bins=[AgeBin(0, 17), AgeBin(18, 64), AgeBin(65, 99)])
    assert len(d) == 3


def test_vaccination_dimension_ordinal():
    v = VaccinationDimension(max_ordinal_vaccinations=2)
    assert [b.name for b in v.bins] == ["v0", "v1", "v2"]
    assert v.max_shots == 2
    assert not v.seasonal_vaccination


def test_vaccination_dimension_seasonal_adds_bin():
    v = VaccinationDimension(max_ordinal_vaccinations=2, seasonal_vaccination=True)
    assert [b.name for b in v.bins] == ["v0", "v1", "v2", "v3"]
    assert v.seasonal_vaccination


def test_full_stratified_history_bins():
    d = FullStratifiedImmuneHistoryDimension(_strains("x", "y"))
    assert [b.name for b in d.bins] == ["none", "x", "y", "x_y"]


def test_full_stratified_three_strains_has_8_bins():
    d = FullStratifiedImmuneHistoryDimension(_strains("a", "b", "c"))
    assert len(d) == 8  # 2^3


def test_last_strain_history_bins():
    d = LastStrainImmuneHistoryDimension(_strains("x", "y"))
    assert [b.name for b in d.bins] == ["none", "x", "y"]


def test_history_requires_strains():
    with pytest.raises(Exception):
        FullStratifiedImmuneHistoryDimension([])
    with pytest.raises(Exception):
        LastStrainImmuneHistoryDimension([])


def test_wane_dimension():
    d = WaneDimension(
        waiting_times=[70.0, 70.0, math.inf],
        base_protections=[1.0, 0.5, 0.1],
    )
    assert [b.name for b in d.bins] == ["W0", "W1", "W2"]
    assert d.bins[1].base_protection == 0.5


def test_wane_dimension_must_end_in_inf():
    with pytest.raises(Exception):
        WaneDimension(waiting_times=[70.0, 80.0], base_protections=[1.0, 0.5])


def test_wane_dimension_parallel_lists():
    with pytest.raises(Exception):
        WaneDimension(waiting_times=[70.0], base_protections=[1.0, 0.5])


def test_dimension_equality():
    a = Dimension(name="age", bins=[Bin(name="x")])
    b = Dimension(name="age", bins=[Bin(name="x")])
    c = Dimension(name="age", bins=[Bin(name="y")])
    assert a == b
    assert a != c
