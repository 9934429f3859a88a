"""Compartment/SimulationConfig validation tests
(spec: reference tests/test_config/test_simulation_config.py + test_compartment.py)."""

from datetime import date

import jax.numpy as jnp
import pytest

from dynode_tpu.config import (
    AgeBin,
    Bin,
    Compartment,
    Dimension,
    FullStratifiedImmuneHistoryDimension,
    Initializer,
    LastStrainImmuneHistoryDimension,
    Params,
    SimulationConfig,
    SolverParams,
    Strain,
    TransmissionParams,
)


class NullInitializer(Initializer):
    def __init__(self, **kw):
        super().__init__(
            description="test",
            initialize_date=date(2022, 1, 1),
            population_size=100,
            **kw,
        )


def _strain(name="x", **kw):
    defaults = dict(strain_name=name, r0=2.0, infectious_period=7.0)
    defaults.update(kw)
    return Strain(**defaults)


def _params(strains=None, **extras):
    strains = strains or [_strain()]
    names = [s.strain_name for s in strains]
    return Params(
        solver_params=SolverParams(),
        transmission_params=TransmissionParams(
            strains=strains,
            strain_interactions={a: {b: 1.0 for b in names} for a in names},
            **extras,
        ),
    )


def _age_dim():
    return Dimension(name="age", bins=[AgeBin(0, 17), AgeBin(18, 99)])


def _config(compartments, params=None):
    return SimulationConfig(
        compartments=compartments,
        initializer=NullInitializer(),
        parameters=params or _params(),
    )


# ---- Compartment ----------------------------------------------------------


def test_compartment_shape_and_idx():
    c = Compartment(name="s", dimensions=[_age_dim()])
    assert c.shape == (2,)
    assert c.idx.age == 0
    assert c.idx.age.a0_17 == 0 and c.idx.age.a18_99 == 1


def test_compartment_duplicate_dim_names_rejected():
    with pytest.raises(Exception):
        Compartment(name="s", dimensions=[_age_dim(), _age_dim()])


def test_compartment_structural_equality():
    a = Compartment(name="s", dimensions=[_age_dim()])
    b = Compartment(name="s", dimensions=[_age_dim()])
    c = Compartment(name="i", dimensions=[_age_dim()])
    assert a == b and a != c
    assert a != "s"


# ---- SimulationConfig -----------------------------------------------------


def test_config_idx_is_int_and_namespace():
    cfg = _config(
        [
            Compartment(name="s", dimensions=[_age_dim()]),
            Compartment(name="i", dimensions=[_age_dim()]),
        ]
    )
    assert int(cfg.idx.s) == 0 and int(cfg.idx.i) == 1
    assert cfg.idx.s.age == 0
    assert cfg.idx.s.age.a0_17 == 0
    # usable directly as a tuple index
    assert (jnp.zeros(2), jnp.ones(2))[cfg.idx.i][0] == 1.0


def test_duplicate_compartment_names_rejected():
    with pytest.raises(Exception):
        _config(
            [
                Compartment(name="s", dimensions=[_age_dim()]),
                Compartment(name="s", dimensions=[_age_dim()]),
            ]
        )


def test_same_named_dimensions_must_match():
    other_age = Dimension(name="age", bins=[AgeBin(0, 99)])
    with pytest.raises(Exception):
        _config(
            [
                Compartment(name="s", dimensions=[_age_dim()]),
                Compartment(name="i", dimensions=[other_age]),
            ]
        )


def test_immune_history_must_match_strains():
    strains = [_strain("a"), _strain("b")]
    good = FullStratifiedImmuneHistoryDimension(strains)
    cfg = _config(
        [Compartment(name="s", dimensions=[good])], params=_params(strains)
    )
    assert len(cfg.get_compartment("s").dimensions[0]) == 4

    wrong = FullStratifiedImmuneHistoryDimension([_strain("z")])
    with pytest.raises(Exception):
        _config(
            [Compartment(name="s", dimensions=[wrong])], params=_params(strains)
        )


def test_last_strain_history_validates_too():
    strains = [_strain("a"), _strain("b")]
    wrong = LastStrainImmuneHistoryDimension([_strain("a")])
    with pytest.raises(Exception):
        _config(
            [Compartment(name="s", dimensions=[wrong])], params=_params(strains)
        )


def test_introduction_ages_mask_encoding():
    strains = [
        _strain("a"),
        _strain(
            "b",
            is_introduced=True,
            introduction_time=30.0,
            introduction_percentage=0.01,
            introduction_scale=4.0,
            introduction_ages=[AgeBin(0, 17)],
        ),
    ]
    cfg = _config(
        [Compartment(name="s", dimensions=[_age_dim()])],
        params=_params(strains),
    )
    a, b = cfg.parameters.transmission_params.strains
    assert b.introduction_ages_mask_vector == [1, 0]
    assert a.introduction_ages_mask_vector == [0, 0]


def test_introduction_ages_must_exist_in_model():
    strains = [
        _strain(
            "a",
            is_introduced=True,
            introduction_time=30.0,
            introduction_ages=[AgeBin(40, 49)],  # not an age bin of the model
        ),
    ]
    with pytest.raises(Exception):
        _config(
            [Compartment(name="s", dimensions=[_age_dim()])],
            params=_params(strains),
        )


def test_get_compartment_and_flatten():
    cfg = _config(
        [
            Compartment(name="s", dimensions=[_age_dim()]),
            Compartment(name="i", dimensions=[_age_dim()]),
        ]
    )
    assert cfg.get_compartment("i").name == "i"
    with pytest.raises(AssertionError):
        cfg.get_compartment("nope")
    assert len(cfg.flatten_dims()) == 2
    assert len(cfg.flatten_bins()) == 4


def test_initializer_base_raises():
    with pytest.raises(NotImplementedError):
        NullInitializer().get_initial_state()
