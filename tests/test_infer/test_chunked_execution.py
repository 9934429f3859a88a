"""Host-chunked MCMC execution must be draw-for-draw identical to monolithic.

``steps_per_call`` bounds each on-chip program's runtime (TPU watchdog);
chunks are padded to one fixed length with masked no-op transitions so each
phase compiles exactly ONE program — a remainder-sized chunk would recompile
the full NUTS program (~minutes over the remote-compile tunnel). Padding and
slicing must not change a single draw.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import MCMC, NUTS, handlers

DATA = jnp.asarray(np.random.default_rng(0).normal(1.5, 1.0, 64))


def _model(obs=None):
    mu = handlers.sample("mu", dist.Normal(0.0, 10.0))
    sd = handlers.sample("sd", dist.LogNormal(0.0, 1.0))
    handlers.sample("obs", dist.Normal(mu, sd), obs=obs)


def _run(steps_per_call):
    m = MCMC(
        NUTS(_model, dense_mass=True),
        num_warmup=33,  # deliberately not a multiple of any chunk size
        num_samples=20,
        num_chains=3,
        progress_bar=False,
        steps_per_call=steps_per_call,
    )
    m.run(jax.random.PRNGKey(5), obs=DATA)
    return m


@pytest.fixture(scope="module")
def monolithic():
    return _run(None)


@pytest.mark.parametrize("spc", [7, 16, 64])
def test_chunked_matches_monolithic(monolithic, spc):
    a = monolithic.get_samples(group_by_chain=True)
    b = _run(spc).get_samples(group_by_chain=True)
    assert set(a) == set(b)
    for k in a:
        assert a[k].shape == b[k].shape
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-12
        )


def test_chunked_extra_fields_sliced_to_num_samples(monolithic):
    m = _run(7)  # 20 samples in chunks of 7 -> padded final chunk
    ef = m.get_extra_fields(group_by_chain=True)
    for k, v in ef.items():
        if k == "step_size":
            assert v.shape == (3,)
        else:
            assert v.shape[:2] == (3, 20), (k, v.shape)
