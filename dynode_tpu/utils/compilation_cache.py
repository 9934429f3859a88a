"""Persistent (on-disk) XLA compilation cache.

The in-process jit cache dies with the interpreter, so every new session
pays the full remote-compile cost again -- on the TPU tunnel a large NUTS
program can take minutes to compile. JAX's persistent compilation cache
serializes compiled executables to disk keyed on the optimized HLO +
compile options + backend version, so a *fresh process* running the same
program loads the executable instead of recompiling (measured on the
v5e tunnel: 3.0s -> 0.06s for a toy program; minutes -> seconds for
NUTS-scale programs).

The reference has no analog (its numpyro/diffrax stack recompiles per
process); this is TPU-operations infrastructure in the spirit of
SURVEY.md section 5's "amortize everything that can be amortized".

Safety: the cache key includes the HLO, so a code change that alters the
traced program is a miss (never stale). Entries are only ever added --
stale files cost disk, not correctness. Keyed per jaxlib/backend
version, so upgrades invalidate cleanly.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_compilation_cache", "compilation_cache_dir"]

_ENV_VAR = "DYNODE_COMPILATION_CACHE"
_DEFAULT_SUBDIR = os.path.join("dynode_tpu", "xla_cache")


def compilation_cache_dir() -> str:
    """The directory used by :func:`enable_compilation_cache` by default.

    ``$DYNODE_COMPILATION_CACHE`` if set, else
    ``$XDG_CACHE_HOME/dynode_tpu/xla_cache`` (``~/.cache`` fallback).
    """
    env = os.environ.get(_ENV_VAR)
    if env:
        return os.path.expanduser(env)
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return os.path.join(base, _DEFAULT_SUBDIR)


def enable_compilation_cache(
    path: Optional[str] = None,
    *,
    min_compile_time_secs: float = 1.0,
) -> str:
    """Turn on JAX's persistent compilation cache for this process.

    Programs whose compile takes >= ``min_compile_time_secs`` are written
    to ``path`` (default :func:`compilation_cache_dir`); later processes
    that trace byte-identical HLO load the executable from disk instead
    of recompiling. Call once, any time before the compile you want
    cached (idempotent; safe to call after other jits have run).

    Returns the cache directory in use.

    Notes
    -----
    - ``DYNODE_COMPILATION_CACHE=0`` (or ``off``/``false``) disables the
      call entirely (returns "" without touching jax.config) -- an
      operator kill-switch for read-only filesystems.
    - The default 1s threshold skips toy programs; pass
      ``min_compile_time_secs=0.0`` to cache everything (tests do).
    """
    import jax

    env = os.environ.get(_ENV_VAR, "").strip().lower()
    if env in ("0", "off", "false", "no"):
        return ""
    cache_dir = os.path.expanduser(path) if path else compilation_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    # cache regardless of entry size (the default floor can skip small
    # executables whose *compile* was expensive on the remote tunnel)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
