"""Strain/TransmissionParams/SolverParams validation tests
(spec: reference tests/test_config/test_params.py and test_strain.py)."""

import jax.numpy as jnp
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.config import (
    DeterministicParameter,
    Params,
    SolverParams,
    Strain,
    TransmissionParams,
)
from dynode_tpu.ode import Tsit5


def _strain(name="x", **kw):
    defaults = dict(strain_name=name, r0=2.0, infectious_period=7.0)
    defaults.update(kw)
    return Strain(**defaults)


def test_solver_params_defaults():
    sp = SolverParams()
    assert isinstance(sp.solver_method, Tsit5)
    assert sp.ode_solver_rel_tolerance == 1e-5
    assert sp.ode_solver_abs_tolerance == 1e-6
    assert sp.max_steps == int(1e6)
    assert sp.constant_step_size == 0
    assert sp.discontinuity_points == []


def test_strain_accepts_distribution_and_link():
    s = Strain(
        strain_name="v",
        r0=dist.Normal(2.0, 0.2),
        infectious_period=7.0,
    )
    assert isinstance(s.r0, dist.Distribution)
    s2 = _strain(r0=DeterministicParameter("other"))
    assert isinstance(s2.r0, DeterministicParameter)


def test_strain_accepts_array_params():
    s = _strain(r0=jnp.array([2.0, 2.5]))
    assert s.r0.shape == (2,)


def test_transmission_params_happy_path():
    tp = TransmissionParams(
        strains=[_strain("a"), _strain("b")],
        strain_interactions={
            "a": {"a": 1.0, "b": 0.7},
            "b": {"a": 0.7, "b": 1.0},
        },
        contact_matrix=jnp.eye(2),
    )
    # extras ride on the open model
    assert tp.contact_matrix.shape == (2, 2)


def test_interactions_missing_outer_key():
    with pytest.raises(Exception):
        TransmissionParams(
            strains=[_strain("a"), _strain("b")],
            strain_interactions={"a": {"a": 1.0, "b": 1.0}},
        )


def test_interactions_missing_inner_key():
    with pytest.raises(Exception):
        TransmissionParams(
            strains=[_strain("a"), _strain("b")],
            strain_interactions={"a": {"a": 1.0}, "b": {"a": 1.0, "b": 1.0}},
        )


def test_interactions_extra_strain_rejected():
    with pytest.raises(Exception):
        TransmissionParams(
            strains=[_strain("a")],
            strain_interactions={"a": {"a": 1.0}, "ghost": {"a": 1.0}},
        )


def test_empty_strains_rejected():
    with pytest.raises(Exception):
        TransmissionParams(strains=[], strain_interactions={})


def test_optional_fields_all_or_none():
    with pytest.raises(Exception):
        TransmissionParams(
            strains=[
                _strain("a", exposed_to_infectious=3.0),
                _strain("b"),  # missing exposed_to_infectious
            ],
            strain_interactions={
                "a": {"a": 1.0, "b": 1.0},
                "b": {"a": 1.0, "b": 1.0},
            },
        )


def test_vaccine_efficacy_all_or_none():
    with pytest.raises(Exception):
        TransmissionParams(
            strains=[
                _strain("a", vaccine_efficacy={0: 0.0, 1: 0.5}),
                _strain("b"),
            ],
            strain_interactions={
                "a": {"a": 1.0, "b": 1.0},
                "b": {"a": 1.0, "b": 1.0},
            },
        )


def test_params_container():
    p = Params(
        solver_params=SolverParams(),
        transmission_params=TransmissionParams(
            strains=[_strain("a")], strain_interactions={"a": {"a": 1.0}}
        ),
    )
    assert p.solver_params.max_steps == int(1e6)
