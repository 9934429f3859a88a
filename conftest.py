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
