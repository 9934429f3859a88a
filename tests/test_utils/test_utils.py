"""Utils tests: splines vs hand-coded polynomials, param helpers, epiweeks
(spec: reference tests/test_utils/test_utils.py)."""

import datetime

import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.utils import (
    EpiWeek,
    base_equation,
    conditional_knots,
    date_to_epi_week,
    date_to_sim_day,
    drop_keys_with_substring,
    evaluate_cubic_spline,
    flatten_list_parameters,
    identify_distribution_indexes,
    sim_day_to_date,
    sim_day_to_epiweek,
    vectorize_objects,
)


# ---- splines --------------------------------------------------------------


def test_base_equation_matches_polynomial():
    coeffs = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4))
    for t in [-2.0, 0.0, 1.5, 15.0, 100.0]:
        got = np.asarray(base_equation(t, coeffs))
        a, b, c, d = [np.asarray(coeffs[..., k]) for k in range(4)]
        want = a + b * t + c * t**2 + d * t**3
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_conditional_knots_indicator():
    knots = jnp.asarray([[[5.0, 10.0]]])
    coeffs = jnp.asarray([[[2.0, 3.0]]])
    # before any knot: zero
    assert float(conditional_knots(4.0, knots, coeffs)[0, 0]) == 0.0
    # between: only first active
    got = float(conditional_knots(7.0, knots, coeffs)[0, 0])
    np.testing.assert_allclose(got, 2.0 * (7.0 - 5.0) ** 3)
    # after both
    got = float(conditional_knots(12.0, knots, coeffs)[0, 0])
    np.testing.assert_allclose(got, 2.0 * 7.0**3 + 3.0 * 2.0**3)


def test_evaluate_cubic_spline_combines():
    rs = np.random.RandomState(1)
    base = jnp.asarray(rs.randn(3, 2, 4))
    knots = jnp.asarray(np.sort(rs.uniform(0, 50, (3, 2, 5)), axis=-1))
    kc = jnp.asarray(rs.randn(3, 2, 5))
    for t in [-2.0, 13.0, 100.0]:
        got = np.asarray(evaluate_cubic_spline(t, knots, base, kc))
        want = np.asarray(base_equation(t, base)) + np.asarray(
            conditional_knots(t, knots, kc)
        )
        np.testing.assert_allclose(got, want, rtol=1e-10)
        assert got.shape == (3, 2)


# ---- object->vector helpers ----------------------------------------------


class _Obj:
    def __init__(self, v, keep=True):
        self.val = v
        self.keep = keep


def test_vectorize_objects():
    objs = [_Obj(1), _Obj(2, keep=False), _Obj(3)]
    assert vectorize_objects(objs, "val") == [1, 2, 3]
    assert vectorize_objects(objs, "val", filter=lambda o: o.keep) == [1, 3]
    with pytest.raises(AssertionError):
        vectorize_objects(objs, 123)


def test_flatten_list_parameters():
    samples = {
        "flat": np.zeros((4, 10)),
        "plated": np.arange(4 * 10 * 3).reshape(4, 10, 3),
        "double": np.zeros((4, 10, 2, 2)),
    }
    out = flatten_list_parameters(samples)
    assert out["flat"].shape == (4, 10)
    assert set(k for k in out if k.startswith("plated")) == {
        "plated_0",
        "plated_1",
        "plated_2",
    }
    np.testing.assert_array_equal(out["plated_1"], samples["plated"][:, :, 1])
    assert out["double_1_0"].shape == (4, 10)


def test_drop_keys_with_substring():
    d = {"keep": 1, "drop_me": 2, "also_drop": 3}
    out = drop_keys_with_substring(d, "drop")
    assert set(out) == {"keep"}


def test_identify_distribution_indexes():
    params = {"test": [0, dist.Normal(), 2], "example": dist.Normal()}
    out = identify_distribution_indexes(params)
    assert out == {
        "test_1": {"sample_name": "test", "sample_idx": (1,)},
        "example": {"sample_name": "example", "sample_idx": None},
    }


def test_identify_distribution_indexes_2d():
    params = {"m": [[dist.Normal(), 0.0], [0.0, dist.Normal()]]}
    out = identify_distribution_indexes(params)
    assert out["m_0_0"]["sample_idx"] == (0, 0)
    assert out["m_1_1"]["sample_idx"] == (1, 1)


# ---- datetime / epiweeks --------------------------------------------------


def test_sim_day_date_roundtrip():
    init = datetime.date(2022, 10, 15)
    assert sim_day_to_date(10, init) == datetime.date(2022, 10, 25)
    assert date_to_sim_day(datetime.date(2022, 11, 5), init) == 21
    assert date_to_sim_day(datetime.date(2022, 10, 5), init) == -10


def test_epiweek_known_values():
    # docstring example from the reference: 2022-10-25 is epiweek 2022-43
    # (week 42 runs Oct 16-22; Oct 25 falls in week 43)
    assert date_to_epi_week(datetime.date(2022, 10, 25)) == EpiWeek(2022, 43)
    # MMWR year boundaries
    assert date_to_epi_week(datetime.date(2021, 1, 1)) == EpiWeek(2020, 53)
    assert date_to_epi_week(datetime.date(2021, 1, 3)) == EpiWeek(2021, 1)
    assert date_to_epi_week(datetime.date(2016, 1, 1)) == EpiWeek(2015, 52)
    assert date_to_epi_week(datetime.date(2016, 1, 3)) == EpiWeek(2016, 1)


def test_sim_day_to_epiweek():
    init = datetime.date(2022, 10, 15)
    assert sim_day_to_epiweek(10, init) == EpiWeek(2022, 43)


def test_epiweek_start_end_dates():
    w = EpiWeek(2022, 43)
    assert w.startdate() == datetime.date(2022, 10, 23)
    assert w.enddate() == datetime.date(2022, 10, 29)
    assert EpiWeek.fromdate(w.startdate()) == w
    assert EpiWeek.fromdate(w.enddate()) == w
