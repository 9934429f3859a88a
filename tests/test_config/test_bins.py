"""Bin validation tests (spec source: reference tests/test_config/test_bins.py)."""

import math

import pytest
from pydantic import ValidationError

from dynode_tpu.config import AgeBin, Bin, DiscretizedPositiveIntBin, WaneBin


def test_plain_bin_name():
    assert Bin(name="young").name == "young"


@pytest.mark.parametrize(
    "bad", ["9to17", "has space", "semi;colon", "dash-name", "dot.name"]
)
def test_invalid_dynode_names_rejected(bad):
    with pytest.raises(ValidationError):
        Bin(name=bad)


@pytest.mark.parametrize("ok", ["a0_17", "under_score", "x", "Y2"])
def test_valid_dynode_names(ok):
    assert Bin(name=ok).name == ok


def test_int_bin_autoname_and_bounds():
    b = DiscretizedPositiveIntBin(5, 10)
    assert b.name == "range_5_10"
    assert (b.min_value, b.max_value) == (5, 10)


def test_int_bin_explicit_name():
    assert DiscretizedPositiveIntBin(0, 4, name="kids").name == "kids"


def test_int_bin_min_leq_max_enforced():
    with pytest.raises(Exception):
        DiscretizedPositiveIntBin(11, 10)

    # min == max is a legal single-value bin
    assert DiscretizedPositiveIntBin(3, 3).min_value == 3


def test_age_bin_autoname():
    assert AgeBin(0, 17).name == "a0_17"


def test_wane_bin_fields():
    w = WaneBin(name="W0", waiting_time=70.0, base_protection=0.5)
    assert w.waiting_time == 70.0
    assert w.base_protection == 0.5


def test_wane_bin_accepts_inf_waiting():
    w = WaneBin(name="Wlast", waiting_time=math.inf, base_protection=0.1)
    assert math.isinf(w.waiting_time)


def test_wane_bin_protection_bounds():
    with pytest.raises(ValidationError):
        WaneBin(name="W0", waiting_time=10.0, base_protection=1.5)
    with pytest.raises(ValidationError):
        WaneBin(name="W0", waiting_time=-1.0, base_protection=0.5)
