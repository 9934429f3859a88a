"""Persistent compilation cache: cross-process executable reuse."""

import os
import subprocess
import sys

import pytest

from dynode_tpu.utils import compilation_cache_dir, enable_compilation_cache

_CHILD = r"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
from dynode_tpu.utils import enable_compilation_cache
d = enable_compilation_cache(sys.argv[1], min_compile_time_secs=0.0)
assert d == sys.argv[1], (d, sys.argv[1])
import jax.numpy as jnp

@jax.jit
def f(x):
    return jnp.sin(x) @ jnp.cos(x.T) + jnp.tanh(x).sum()

x = jnp.ones((257, 129), jnp.float32)
t0 = time.perf_counter()
f(x).block_until_ready()
print("ELAPSED", time.perf_counter() - t0)
"""


def _run_child(cache_dir, repo_root):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cache_dir)],
        capture_output=True,
        text=True,
        cwd=repo_root,
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise AssertionError(out.stdout + out.stderr)


def test_cache_populates_and_second_process_hits(tmp_path):
    cache = tmp_path / "xla_cache"
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    cold = _run_child(cache, repo_root)
    entries = [
        f for _, _, fs in os.walk(cache) for f in fs
    ]
    assert entries, "cache directory empty after first process"
    warm = _run_child(cache, repo_root)
    # a disk hit skips compilation entirely; require a decisive win so the
    # test stays meaningful on loaded hosts
    assert warm < cold * 0.6, (cold, warm)


def test_env_killswitch(monkeypatch, tmp_path):
    monkeypatch.setenv("DYNODE_COMPILATION_CACHE", "off")
    assert enable_compilation_cache(str(tmp_path / "never")) == ""
    assert not (tmp_path / "never").exists()


def test_default_dir_respects_env(monkeypatch, tmp_path):
    monkeypatch.setenv("DYNODE_COMPILATION_CACHE", str(tmp_path / "d"))
    assert compilation_cache_dir() == str(tmp_path / "d")
    monkeypatch.delenv("DYNODE_COMPILATION_CACHE")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "x"))
    assert compilation_cache_dir() == str(
        tmp_path / "x" / "dynode_tpu" / "xla_cache"
    )
