"""DeterministicParameter, PlaceholderSample, and init-date flag tests
(spec: reference tests/test_config/test_deterministic_parameter.py,
test_placeholder_sample.py, test_simulation_date.py)."""

import os
from datetime import date

import jax
import numpy as np
import pytest

from dynode_tpu.config import (
    DeterministicParameter,
    PlaceholderSample,
    SamplePlaceholderError,
    get_dynode_init_date_flag,
    set_dynode_init_date_flag,
    simulation_day,
)
from dynode_tpu.infer import Predictive, handlers


@pytest.fixture(autouse=True)
def _clear_init_date_env():
    key = f"DYNODE_INITIALIZATION_DATE({os.getpid()})"
    os.environ.pop(key, None)
    yield
    os.environ.pop(key, None)


# ---- DeterministicParameter -----------------------------------------------


def test_resolve_whole_value():
    dp = DeterministicParameter(depends_on="x")
    assert dp.resolve({"x": 5}) == 5


def test_resolve_with_index():
    dp = DeterministicParameter(depends_on="xs", index=1)
    assert dp.resolve({"xs": [10, 20, 30]}) == 20


def test_resolve_with_slice():
    dp = DeterministicParameter(depends_on="xs", index=slice(0, 2))
    assert dp.resolve({"xs": [10, 20, 30]}) == [10, 20]


def test_resolve_with_transform():
    dp = DeterministicParameter(depends_on="x", transform=lambda v: v * 2)
    assert dp.resolve({"x": 5}) == 10


def test_resolve_missing_key_raises_descriptive():
    dp = DeterministicParameter(depends_on="missing")
    with pytest.raises(Exception, match="missing"):
        dp.resolve({"x": 1})


def test_resolve_bad_index_raises():
    dp = DeterministicParameter(depends_on="xs", index=99)
    with pytest.raises(Exception):
        dp.resolve({"xs": [1, 2]})


def test_resolve_tuple_index_on_list_raises():
    dp = DeterministicParameter(depends_on="xs", index=(0, 1))
    with pytest.raises(Exception):
        dp.resolve({"xs": [[1, 2], [3, 4]]})


def test_resolve_tuple_index_on_ndarray():
    dp = DeterministicParameter(depends_on="xs", index=(0, 1))
    assert dp.resolve({"xs": np.array([[1, 2], [3, 4]])}) == 2


# ---- PlaceholderSample ----------------------------------------------------


def test_placeholder_raises_on_raw_sample():
    with pytest.raises(SamplePlaceholderError):
        PlaceholderSample().sample(jax.random.PRNGKey(0))


def test_placeholder_raises_inside_plain_seed():
    def model():
        handlers.sample("p", PlaceholderSample())

    with pytest.raises(SamplePlaceholderError):
        with handlers.seed(0):
            model()


def test_placeholder_substituted_ok():
    def model():
        return handlers.sample("p", PlaceholderSample())

    with handlers.seed(0), handlers.substitute({"p": 42.0}):
        assert model() == 42.0


def test_placeholder_via_predictive():
    def model():
        p = handlers.sample("p", PlaceholderSample())
        handlers.deterministic("double", p * 2)

    import jax.numpy as jnp

    post = {"p": jnp.arange(4.0)}
    out = Predictive(model, posterior_samples=post, exclude_deterministic=False)(
        jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.asarray(out["double"]), [0, 2, 4, 6])


# ---- init-date flag -------------------------------------------------------


def test_flag_unset_returns_none():
    assert get_dynode_init_date_flag() is None


def test_simulation_day_requires_flag():
    with pytest.raises(ValueError):
        simulation_day(2022, 5, 1)


def test_set_and_read_flag():
    set_dynode_init_date_flag(date(2022, 2, 11))
    assert get_dynode_init_date_flag() == date(2022, 2, 11)


def test_simulation_day_math():
    set_dynode_init_date_flag(date(2022, 2, 11))
    assert simulation_day(2022, 2, 11) == 0
    assert simulation_day(2022, 2, 21) == 10
    assert simulation_day(2022, 2, 1) == -10
