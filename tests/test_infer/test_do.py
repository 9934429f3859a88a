"""handlers.do: Pearl-style intervention (numpyro.handlers.do parity).

Intervention severs the edge from a site into its children: downstream
code sees the pinned value, the original stochastic site keeps its own
name, draw, and density. This is the scenario-counterfactual primitive
(fit a posterior, replay forward with a policy-pinned parameter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import Predictive, handlers
from dynode_tpu.infer.util import log_density


def _model(obs=None):
    z = handlers.sample("z", dist.Normal(0.0, 1.0))
    return handlers.sample("y", dist.Normal(3.0 * z, 0.1), obs=obs)


def test_do_pins_downstream_and_keeps_original_stochastic():
    with handlers.trace() as tr, handlers.seed(rng_seed=0), handlers.do(
        data={"z": 5.0}
    ):
        y = _model()
    assert "z" in tr and "z__do" in tr
    assert tr["z__do"]["type"] == "deterministic"
    assert float(tr["z__do"]["value"]) == 5.0
    # the original site is a real stochastic draw, not the intervention
    assert tr["z"]["type"] == "sample"
    assert abs(float(tr["z"]["value"])) < 5.0 - 1e-3
    # downstream saw the intervened value
    assert abs(float(y) - 15.0) < 1.0


def test_do_leaves_joint_density_over_latents_unchanged():
    obs = jnp.asarray(14.9)

    def intervened(obs=None):
        with handlers.do(data={"z": 5.0}):
            _model(obs=obs)

    z = jnp.asarray(0.7)
    lj, tr = log_density(intervened, (), {"obs": obs}, {"z": z})
    # z keeps its own prior density; the likelihood is evaluated at do-z
    want = dist.Normal(0.0, 1.0).log_prob(z) + dist.Normal(15.0, 0.1).log_prob(obs)
    np.testing.assert_allclose(float(lj), float(want), rtol=1e-6)
    assert tr["z__do"]["type"] == "deterministic"


def test_do_composes_with_substitute_on_the_original():
    with handlers.trace() as tr, handlers.seed(rng_seed=0), handlers.do(
        data={"z": -2.0}
    ), handlers.substitute(data={"z": 0.25}):
        y = _model()
    assert float(tr["z"]["value"]) == 0.25
    assert abs(float(y) - (-6.0)) < 1.0


def test_nested_do_innermost_wins():
    with handlers.trace() as tr, handlers.seed(rng_seed=0), handlers.do(
        data={"z": 100.0}
    ), handlers.do(data={"z": 1.0}):
        _model()
    assert float(tr["z__do"]["value"]) == 1.0
    assert "z__do__do" not in tr


def test_do_under_plate_broadcasts():
    def plated():
        with handlers.plate("site", 4):
            r = handlers.sample("r", dist.LogNormal(0.0, 0.5))
        return handlers.sample("y", dist.Normal(r, 0.01))

    pinned = jnp.full((4,), 2.0)
    with handlers.trace() as tr, handlers.seed(rng_seed=1), handlers.do(
        data={"r": pinned}
    ):
        y = plated()
    assert tr["r"]["value"].shape == (4,)
    np.testing.assert_allclose(np.asarray(tr["r__do"]["value"]), 2.0)
    np.testing.assert_allclose(np.asarray(y), 2.0, atol=0.1)


def test_do_with_predictive_counterfactual():
    # posterior-predictive replay under an intervention: the classic
    # "what if r0 had been pinned" workflow
    samples = {"z": jnp.linspace(-1.0, 1.0, 8)}

    def scenario(obs=None):
        with handlers.do(data={"z": 2.0}):
            _model(obs=obs)

    pred = Predictive(scenario, posterior_samples=samples)
    out = pred(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["y"]), 6.0, atol=1.0)


def test_do_on_observed_site_replays_observation():
    obs = jnp.asarray(1.5)

    def model_obs():
        y = handlers.sample("y", dist.Normal(0.0, 1.0), obs=obs)
        return handlers.deterministic("twice", 2.0 * y)

    with handlers.trace() as tr, handlers.seed(rng_seed=0), handlers.do(
        data={"y": -4.0}
    ):
        model_obs()
    assert float(tr["y"]["value"]) == 1.5 and bool(tr["y"]["is_observed"])
    assert float(tr["y__do"]["value"]) == -4.0
    assert float(tr["twice"]["value"]) == -8.0
