"""Warm-start (chained inference) and state serialization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import (
    MCMC,
    NUTS,
    handlers,
    load_mcmc_warm_start,
    load_pytree,
    save_mcmc,
    save_pytree,
)

DATA = jnp.asarray(np.random.RandomState(3).randn(64) + 0.4)


def model(obs=None):
    mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
    handlers.sample("x", dist.Normal(mu, 1.0), obs=obs)


def _fresh(num_warmup=100, num_samples=100):
    return MCMC(
        NUTS(model, max_tree_depth=6),
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=2,
    )


def test_warm_start_continues_sampling():
    first = _fresh()
    first.run(jax.random.PRNGKey(0), obs=DATA)
    ws = first.warm_start_state()

    cont = _fresh(num_warmup=1, num_samples=100)
    cont.run(jax.random.PRNGKey(1), warm_start=ws, obs=DATA)
    mu = np.asarray(cont.get_samples()["mu"])
    expected = float(DATA.mean()) * 64 / 65
    assert abs(mu.mean() - expected) < 0.08
    # continuation really started from the previous end state, not re-warmup
    first_mu = np.asarray(first.get_samples()["mu"])
    assert not np.allclose(mu[:10], first_mu[:10])


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "b": (jnp.ones(4), {"c": jnp.asarray(2)}),
    }
    path = str(tmp_path / "state.npz")
    save_pytree(path, tree)
    back = load_pytree(path)
    np.testing.assert_allclose(np.asarray(back["a"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(back["b"][0]), 1.0)
    assert int(back["b"][1]["c"]) == 2


def test_mcmc_save_and_warm_start_from_disk(tmp_path):
    first = _fresh()
    first.run(jax.random.PRNGKey(0), obs=DATA)
    path = str(tmp_path / "mcmc.npz")
    save_mcmc(path, first)

    ws = load_mcmc_warm_start(path)
    cont = _fresh(num_warmup=1, num_samples=50)
    cont.run(jax.random.PRNGKey(2), warm_start=ws, obs=DATA)
    mu = np.asarray(cont.get_samples()["mu"])
    assert np.all(np.isfinite(mu))
    saved = load_pytree(path)
    assert saved["samples"]["mu"].shape == (2, 100)
