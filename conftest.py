"""Root conftest: force CPU with a virtual 8-device mesh for the test suite.

The environment's axon sitecustomize force-registers a remote-TPU backend and
sets ``jax_platforms="axon,cpu"`` at interpreter start; tests must run on
local CPU (fast compiles, x64 for tight numerical oracles), so we override
the config back to cpu before any backend initializes. Multi-device sharding
tests use the 8 virtual host devices. TPU runs use bench.py /
__graft_entry__.py instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# smoke tier: `pytest -m smoke` = a <5-min-on-1-core contract subset
# (config cascade, ODE engine contracts, handler/sample site contract, one
# conjugate MCMC end-to-end, the minimal example). The full suite is ~6 min
# on a multi-core host but >60 min on 1 core; constrained environments (CI
# snapshot drivers) run the smoke tier first so a timeout can never report
# nothing. Modules are marked here by path so test files stay marker-free.
# ---------------------------------------------------------------------------

_SMOKE_PREFIXES = (
    "tests/test_config/",
    "tests/test_ode/test_engine.py",
    "tests/test_simulation/test_odes.py",
    "tests/test_infer/test_handlers_and_sample.py",
    "tests/test_infer/test_checkpointing.py",
    "tests/test_infer/test_inference.py",
    "tests/test_parity/",
)
_SMOKE_NODEIDS = (
    "tests/test_examples/test_examples_run.py::test_example_runs_headless[sir.py]",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid.startswith(_SMOKE_PREFIXES) or nodeid in _SMOKE_NODEIDS:
            item.add_marker(pytest.mark.smoke)
