"""The `dynode` alias package mirrors the reference's import paths."""


def test_reference_style_imports():
    from dynode import MCMCProcess, Strain, SVIProcess  # noqa: F401
    from dynode.config import (  # noqa: F401
        Bin,
        Compartment,
        Dimension,
        Initializer,
        Params,
        SimulationConfig,
        SolverParams,
        TransmissionParams,
    )
    from dynode.infer import sample_then_resolve  # noqa: F401
    from dynode.simulation import AbstractODEParams, simulate  # noqa: F401
    from dynode.typing import CompartmentState, DynodeName  # noqa: F401
    from dynode.utils import vectorize_objects  # noqa: F401


def test_alias_is_the_same_objects():
    import dynode
    import dynode_tpu

    assert dynode.SimulationConfig is dynode_tpu.SimulationConfig
    assert dynode.config is dynode_tpu.config
