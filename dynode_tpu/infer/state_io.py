"""Serialize inference state to disk (resume / chained-fit across processes).

Saves pytrees of device arrays (HMCState tuples, SVI params, posterior
sample dicts) as an ``.npz`` of leaves plus a treedef pickle -- dependency
free and robust across process restarts on the same code version.
"""

import io
import pickle
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Write any pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(tree))
    buf = io.BytesIO()
    pickle.dump(treedef, buf)
    np.savez(
        path,
        __treedef__=np.frombuffer(buf.getvalue(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_pytree(path: str) -> Any:
    """Inverse of :func:`save_pytree`.

    Note: unpickles the treedef -- only load files you wrote.
    """
    with np.load(path, allow_pickle=False) as data:
        treedef = pickle.loads(data["__treedef__"].tobytes())
        n = len(data.files) - 1
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_mcmc(path: str, mcmc) -> None:
    """Persist an MCMC run: samples, extra fields, and warm-start state."""
    save_pytree(
        path,
        {
            "samples": mcmc.get_samples(group_by_chain=True),
            "extra_fields": mcmc.get_extra_fields(group_by_chain=True),
            "warm_start": mcmc.warm_start_state(),
        },
    )


def load_mcmc_warm_start(path: str):
    """Load the warm-start tuple saved by :func:`save_mcmc`.

    Rehydrates the HMCState namedtuple (treedef preserves the type).
    """
    return load_pytree(path)["warm_start"]


__all__ = ["save_pytree", "load_pytree", "save_mcmc", "load_mcmc_warm_start"]
