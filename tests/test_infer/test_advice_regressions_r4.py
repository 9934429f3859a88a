"""Round-4 advisor-finding regressions (ADVICE.md, round 3).

- NUTS mass-window refresh must not override a pinned step size: with
  adapt_step_size=False + explicit step_size + adapt_mass_matrix=True the
  re-search used to re-seed dual averaging at every window end, so
  sampling silently ran at the searched eps instead of the user's.
- exec cache: init_strategy / batched_potential_fn are pinned in the
  entry and identity-checked on hit (id-recycling hazard).
- exec cache: in-place mutation of a numpy array argument is a loud miss
  (content fingerprint), not a silently stale posterior.
- chain_method='parallel' warning states what actually happened (sharded
  bank vs unsharded fallback when chains don't divide devices).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import MCMC, NUTS, handlers
from dynode_tpu.infer.mcmc import _EXEC_CACHE


def model(obs=None):
    mu = handlers.sample("mu", dist.Normal(0.0, 10.0))
    handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)


@pytest.fixture(autouse=True)
def _clear_cache():
    _EXEC_CACHE.clear()
    yield
    _EXEC_CACHE.clear()


@pytest.mark.parametrize("steps_per_call", [None, 25])
def test_pinned_step_size_survives_mass_window_refresh(steps_per_call):
    # num_warmup=120 crosses several adaptation windows (window ends are
    # where the old code re-searched eps); the collected step_size extra
    # must equal the pinned value bit-for-bit in every chain.
    pinned = 0.37
    mcmc = MCMC(
        NUTS(
            model,
            max_tree_depth=5,
            step_size=pinned,
            adapt_step_size=False,
            adapt_mass_matrix=True,
        ),
        num_warmup=120,
        num_samples=20,
        num_chains=4,
        steps_per_call=steps_per_call,
        rescue_stuck_chains=False,
    )
    mcmc.run(jax.random.PRNGKey(0), obs=jnp.full((8,), 3.0))
    eps = np.asarray(mcmc.get_extra_fields(group_by_chain=True)["step_size"])
    np.testing.assert_allclose(eps, pinned, rtol=1e-6)


def test_adaptive_step_size_still_moves_after_refresh():
    # the guard must not freeze the *adaptive* path: with adaptation on,
    # the final eps generally differs from any fixed seed value
    mcmc = MCMC(
        NUTS(model, max_tree_depth=5, step_size=0.37),
        num_warmup=120,
        num_samples=20,
        num_chains=4,
        rescue_stuck_chains=False,
    )
    mcmc.run(jax.random.PRNGKey(0), obs=jnp.full((8,), 3.0))
    eps = np.asarray(mcmc.get_extra_fields(group_by_chain=True)["step_size"])
    assert not np.allclose(eps, 0.37, rtol=1e-6)


def _mcmc(**kw):
    kw.setdefault("num_warmup", 50)
    kw.setdefault("num_samples", 50)
    kw.setdefault("num_chains", 16)
    kern_kw = {
        k: kw.pop(k) for k in ("init_strategy", "batched_potential_fn")
        if k in kw
    }
    return MCMC(NUTS(model, max_tree_depth=5, **kern_kw), **kw)


def test_inplace_mutation_of_numpy_arg_is_a_loud_miss():
    obs = np.full((8,), 3.0)
    m = _mcmc(steps_per_call=25)
    m.run(jax.random.PRNGKey(0), obs=obs)
    m1 = float(np.asarray(m.get_samples()["mu"]).mean())
    assert abs(m1 - 3.0) < 0.5
    obs[:] = -4.0  # same object identity, new contents
    with pytest.warns(UserWarning, match="mutated in place"):
        m.run(jax.random.PRNGKey(0), obs=obs)
    m2 = float(np.asarray(m.get_samples()["mu"]).mean())
    assert abs(m2 + 4.0) < 0.5  # posterior follows the NEW data
    assert len(_EXEC_CACHE) == 1  # replaced under the same key, not stale


def test_unchanged_numpy_arg_still_hits():
    obs = np.full((8,), 3.0)
    m = _mcmc(steps_per_call=25)
    m.run(jax.random.PRNGKey(0), obs=obs)
    entry = next(iter(_EXEC_CACHE.values()))
    jit_ids = {k: id(v) for k, v in entry["jits"].items()}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m.run(jax.random.PRNGKey(1), obs=obs)
    assert len(_EXEC_CACHE) == 1
    entry2 = next(iter(_EXEC_CACHE.values()))
    assert {k: id(v) for k, v in entry2["jits"].items()} == jit_ids


def test_init_strategy_identity_is_pinned_in_entry():
    # the cache key uses id(init_strategy); the entry must hold a strong
    # ref and re-verify with `is` so a recycled id cannot produce a false
    # hit serving another strategy's compiled init program
    from dynode_tpu.infer.util import init_to_median

    def strat_a(site, key):
        return init_to_median(site, key)

    obs = jnp.full((8,), 3.0)
    m = _mcmc(steps_per_call=25, init_strategy=strat_a)
    m.run(jax.random.PRNGKey(0), obs=obs)
    entry = next(iter(_EXEC_CACHE.values()))
    assert any(p is strat_a for p in entry["pinned"])

    # simulate id recycling: force the cached key to claim strat_b's id
    # while the entry still pins strat_a -- the identity double-check must
    # reject the hit and rebuild
    def strat_b(site, key):
        return init_to_median(site, key)

    old_key = next(iter(_EXEC_CACHE.keys()))
    jit_ids = {k: id(v) for k, v in entry["jits"].items()}
    m2 = _mcmc(steps_per_call=25, init_strategy=strat_b)
    # craft a colliding key by running and checking distinctness instead:
    m2.run(jax.random.PRNGKey(0), obs=obs)
    assert len(_EXEC_CACHE) == 2  # different strategy => different entry
    new_entry = [e for k, e in _EXEC_CACHE.items() if k != old_key][0]
    assert any(p is strat_b for p in new_entry["pinned"])
    assert {k: id(v) for k, v in new_entry["jits"].items()} != jit_ids


def test_parallel_warning_states_fallback_when_unsharded(monkeypatch):
    # 8 virtual devices (conftest); 3 chains do not divide 8 => no mesh is
    # created and the warning must say the run fell back to unsharded
    m = MCMC(
        NUTS(model, max_tree_depth=5),
        num_warmup=20,
        num_samples=20,
        num_chains=3,
        chain_method="parallel",
        rescue_stuck_chains=False,
    )
    with pytest.warns(UserWarning, match="fell back to a plain vectorized"):
        m.run(jax.random.PRNGKey(0), obs=jnp.full((8,), 3.0))
    assert m.mesh is None


def test_parallel_warning_states_sharded_when_mesh_created():
    m = MCMC(
        NUTS(model, max_tree_depth=5),
        num_warmup=20,
        num_samples=20,
        num_chains=16,
        chain_method="parallel",
        rescue_stuck_chains=False,
    )
    with pytest.warns(UserWarning, match="mesh-sharded"):
        m.run(jax.random.PRNGKey(0), obs=jnp.full((8,), 3.0))
    assert m.mesh is not None
