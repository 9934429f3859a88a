"""Mesh/sharding tests on the 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynode_tpu.parallel import (
    create_mesh,
    host_batch,
    replicated,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_create_mesh_default():
    mesh = create_mesh(("chain",))
    assert mesh.shape == {"chain": 8}


def test_create_mesh_2d_with_inference():
    mesh = create_mesh(("chain", "ensemble"), axis_sizes=(4, -1))
    assert mesh.shape == {"chain": 4, "ensemble": 2}


def test_create_mesh_bad_sizes():
    with pytest.raises(AssertionError):
        create_mesh(("chain",), axis_sizes=(3,))


def test_host_batch_rounds_up():
    mesh = create_mesh(("chain",))
    assert host_batch(mesh, 10, "chain") == 16
    assert host_batch(mesh, 8, "chain") == 8


def test_sharded_ensemble_simulate():
    """A vmapped solve with a sharded batch axis keeps its sharding."""
    from dynode_tpu import simulate
    from dynode_tpu.config import SolverParams
    from dynode_tpu.models.sir import SIRParams, sir_ode

    mesh = create_mesh(("ensemble",))
    sharding = shard_batch(mesh, "ensemble")
    betas = jax.device_put(jnp.linspace(0.15, 0.5, 16), sharding)
    y0 = (jnp.array([0.99]), jnp.array([0.01]), jnp.array([0.0]))
    cm = jnp.array([[1.0]])

    def final_i(beta):
        p = SIRParams(beta=beta, gamma=jnp.asarray(1 / 7.0), contact_matrix=cm)
        return simulate(sir_ode, 100, y0, p, SolverParams(step_budget=128)).ys[1][-1, 0]

    out = jax.jit(jax.vmap(final_i))(betas)
    assert out.shape == (16,)
    assert "ensemble" in str(out.sharding)
    # epidemic size grows with beta
    arr = np.asarray(out)
    assert arr[-1] != arr[0]


def test_replicated_sharding():
    mesh = create_mesh(("chain",))
    x = jax.device_put(jnp.ones((4, 4)), replicated(mesh))
    assert x.sharding.is_fully_replicated


def test_sharded_chains_mcmc():
    """MCMC with mesh= shards the chain axis across devices."""
    import dynode_tpu.dist as dist
    from dynode_tpu.infer import MCMC, NUTS, handlers

    data = jnp.asarray(np.random.RandomState(0).randn(64) + 0.5)

    def model(obs=None):
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        handlers.sample("x", dist.Normal(mu, 1.0), obs=obs)

    mesh = create_mesh(("chain",))
    mcmc = MCMC(
        NUTS(model, max_tree_depth=6),
        num_warmup=50,
        num_samples=50,
        num_chains=8,
        mesh=mesh,
    )
    mcmc.run(jax.random.PRNGKey(0), obs=data)
    samples = mcmc.get_samples(group_by_chain=True)["mu"]
    assert samples.shape == (8, 50)
    mu = float(np.asarray(samples).mean())
    assert abs(mu - float(data.mean()) * 64 / 65) < 0.1


def test_sharded_chees_bank_matches_unsharded():
    """ChEES's cross-chain adaptation reduces over the sharded chain axis
    (GSPMD psum collectives). The sharded bank must produce the same
    draws as the unsharded one up to float reduction-order noise."""
    import dynode_tpu.dist as dist
    from dynode_tpu.infer import MCMC, ChEES, handlers

    data = jnp.asarray(np.random.RandomState(1).randn(48) + 0.3)

    def model(obs=None):
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        sigma = handlers.sample("sigma", dist.LogNormal(0.0, 0.5))
        handlers.sample("x", dist.Normal(mu, sigma), obs=obs)

    def run(mesh):
        mcmc = MCMC(
            ChEES(model),
            num_warmup=80,
            num_samples=60,
            num_chains=16,
            mesh=mesh,
            chain_axis="chain",
        )
        mcmc.run(jax.random.PRNGKey(3), obs=data)
        return np.asarray(mcmc.get_samples(group_by_chain=True)["mu"])

    sharded = run(create_mesh(("chain",)))
    unsharded = run(None)
    assert sharded.shape == unsharded.shape == (16, 60)
    # per-draw equality is NOT expected: a single MH accept threshold
    # crossed differently under a different reduction order cascades. The
    # contract is distributional: both banks sample the same posterior.
    expected = float(data.mean()) * 48 / 49
    assert abs(float(sharded.mean()) - expected) < 0.1
    assert abs(float(unsharded.mean()) - expected) < 0.1
    assert abs(float(sharded.std()) - float(unsharded.std())) < 0.05
    assert bool(np.isfinite(sharded).all())
