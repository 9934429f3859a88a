"""run_multistart exec cache: compiled banks are reused across re-fits.

Mirrors tests/test_infer/test_exec_cache.py's contract for MCMC: repeat
calls with the same bank shape and the same model-argument OBJECTS reuse
the jitted bank (fresh seeds are traced inputs); a different obs array is
a deliberate miss whose result follows the new data (args are compiled-in
constants, never served stale).
"""

import jax
import jax.numpy as jnp
import numpy as np

import dynode_tpu.dist as dist
from dynode_tpu.infer import handlers
from dynode_tpu.infer.svi import SVI, Adam, AutoNormal, Trace_ELBO


def model(obs=None):
    mu = handlers.sample("mu", dist.Normal(0.0, 10.0))
    handlers.sample("obs", dist.Normal(mu, 1.0), obs=obs)


def _svi():
    return SVI(model, AutoNormal(model), Adam(step_size=0.1), Trace_ELBO())


def test_repeat_fits_reuse_the_compiled_bank():
    svi = _svi()
    obs = jnp.full((16,), 3.0)
    r1 = svi.run_multistart(
        jax.random.PRNGKey(0), num_steps=200, num_starts=4, obs=obs
    )
    assert len(svi._multistart_cache) == 1
    fn_id = id(next(iter(svi._multistart_cache.values()))["fn"])
    r2 = svi.run_multistart(
        jax.random.PRNGKey(7), num_steps=200, num_starts=4, obs=obs
    )
    assert len(svi._multistart_cache) == 1
    assert id(next(iter(svi._multistart_cache.values()))["fn"]) == fn_id
    # different seed => different jitters, same compiled program; both fits
    # converge to the data
    for r in (r1, r2):
        loc = float(np.asarray(r.params["auto_loc"])[0])
        assert abs(loc - 3.0) < 0.3
    # init_jitter is a traced input: changing it must NOT recompile
    svi.run_multistart(
        jax.random.PRNGKey(9), num_steps=200, num_starts=4,
        init_jitter=0.5, obs=obs,
    )
    assert len(svi._multistart_cache) == 1


def test_new_obs_object_misses_and_result_follows_data():
    svi = _svi()
    r1 = svi.run_multistart(
        jax.random.PRNGKey(0), num_steps=200, num_starts=4,
        obs=jnp.full((16,), 3.0),
    )
    r2 = svi.run_multistart(
        jax.random.PRNGKey(0), num_steps=200, num_starts=4,
        obs=jnp.full((16,), -4.0),
    )
    assert len(svi._multistart_cache) == 2
    assert abs(float(np.asarray(r1.params["auto_loc"])[0]) - 3.0) < 0.3
    assert abs(float(np.asarray(r2.params["auto_loc"])[0]) + 4.0) < 0.3


def test_different_bank_shape_is_a_separate_entry():
    svi = _svi()
    obs = jnp.full((16,), 3.0)
    svi.run_multistart(
        jax.random.PRNGKey(0), num_steps=50, num_starts=4, obs=obs
    )
    svi.run_multistart(
        jax.random.PRNGKey(0), num_steps=50, num_starts=8, obs=obs
    )
    assert len(svi._multistart_cache) == 2
