"""Effect handlers + the sample/resolve site-naming contract
(spec: reference tests/test_infer/test_sample.py:17-152)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from pydantic import BaseModel, ConfigDict

import dynode_tpu.dist as dist
from dynode_tpu.config import DeterministicParameter
from dynode_tpu.infer import (
    handlers,
    resolve_deterministic,
    sample_distributions,
    sample_then_resolve,
)


# ---- handlers -------------------------------------------------------------


def test_seed_trace_substitute_roundtrip():
    def model():
        x = handlers.sample("x", dist.Normal(0.0, 1.0))
        handlers.deterministic("x2", x * 2)
        return x

    with handlers.trace() as tr, handlers.seed(0):
        x = model()
    assert set(tr) == {"x", "x2"}
    assert not tr["x"]["is_observed"]
    np.testing.assert_allclose(float(tr["x2"]["value"]), 2 * float(x))

    with handlers.trace() as tr2, handlers.seed(0), handlers.substitute({"x": 5.0}):
        model()
    assert float(tr2["x"]["value"]) == 5.0
    assert float(tr2["x2"]["value"]) == 10.0


def test_obs_marks_observed():
    def model(obs):
        handlers.sample("y", dist.Normal(0.0, 1.0), obs=obs)

    with handlers.trace() as tr, handlers.seed(0):
        model(jnp.asarray(2.0))
    assert tr["y"]["is_observed"] and float(tr["y"]["value"]) == 2.0


def test_sample_without_context_needs_key():
    with pytest.raises(ValueError):
        handlers.sample("z", dist.Normal(0.0, 1.0))
    val = handlers.sample("z", dist.Normal(0.0, 1.0), rng_key=jax.random.PRNGKey(0))
    assert jnp.shape(val) == ()


def test_block_isolates_inner_traces():
    def inner_model():
        handlers.sample("shared", dist.Normal(0.0, 1.0))

    def outer_model():
        with handlers.block(), handlers.trace(), handlers.seed(1):
            inner_model()
        handlers.sample("shared", dist.Normal(0.0, 1.0))

    with handlers.trace() as tr, handlers.seed(0):
        outer_model()  # no duplicate-site error; outer sees one site
    assert list(tr) == ["shared"]


def test_duplicate_sites_rejected():
    def model():
        handlers.sample("a", dist.Normal(0.0, 1.0))
        handlers.sample("a", dist.Normal(0.0, 1.0))

    with pytest.raises(ValueError, match="duplicate"):
        with handlers.trace(), handlers.seed(0):
            model()


# ---- sample_distributions / resolve_deterministic -------------------------


class _TP(BaseModel):
    model_config = ConfigDict(arbitrary_types_allowed=True, extra="allow")


def test_site_naming_contract():
    """Paths join with underscores: dict keys, list indices, nested dicts."""
    params = {
        "a": dist.Normal(0.0, 1.0),
        "b": [0.0, dist.Normal(0.0, 1.0), 2.0],
        "c": [dist.Normal(0.0, 1.0), 1.0],
        "d": {"nested_dict": dist.Normal(0.0, 1.0)},
    }
    with handlers.trace() as tr, handlers.seed(0):
        sample_distributions(params)
    assert set(tr) == {"a", "b_1", "c_0", "d_nested_dict"}


def test_site_naming_with_prefix():
    params = {"a": dist.Normal(0.0, 1.0)}
    with handlers.trace() as tr, handlers.seed(0):
        sample_distributions(params, _prefix="fit2_")
    assert set(tr) == {"fit2_a"}


def test_sample_distributions_preserves_structure():
    params = {"x": 1.0, "lst": [1, dist.Normal(5.0, 0.001)], "s": "keep"}
    with handlers.seed(0):
        out = sample_distributions(params)
    assert out["x"] == 1.0 and out["s"] == "keep"
    assert abs(float(out["lst"][1]) - 5.0) < 0.1


def test_sample_distributions_pydantic_reconstruction():
    obj = _TP(plain=3.0, prior=dist.Normal(1.0, 0.001))
    with handlers.seed(0):
        out = sample_distributions(obj)
    assert isinstance(out, _TP)
    assert out.plain == 3.0
    assert abs(float(out.prior) - 1.0) < 0.1


def test_resolve_deterministic_links():
    params = {
        "x": 4.0,
        "y": DeterministicParameter("x"),
        "x_lst": [0.0, 1.5, 2.0],
        "y_lst": DeterministicParameter("x_lst", index=1),
    }
    with handlers.trace() as tr, handlers.seed(0):
        out = resolve_deterministic(params, root_params=params)
    assert out["y"] == 4.0
    assert out["y_lst"] == 1.5
    assert set(tr) == {"y", "y_lst"}  # recorded as deterministic sites
    assert all(s["type"] == "deterministic" for s in tr.values())


def test_sample_then_resolve_end_to_end():
    params = {
        "x": dist.Normal(2.0, 0.001),
        "y": DeterministicParameter("x", transform=lambda v: v * 10),
    }
    with handlers.seed(0):
        out = sample_then_resolve(params)
    np.testing.assert_allclose(float(out["y"]), 10 * float(out["x"]), rtol=1e-6)
    # original dict untouched (deepcopy semantics)
    assert isinstance(params["x"], dist.Distribution)


def test_strain_naming_matches_reference_convention():
    """strains_0_r0 -- the site name models rely on
    (reference: examples/sir_infer_parameters.py:127)."""
    from dynode_tpu.config import Strain, TransmissionParams

    tp = TransmissionParams(
        strains=[
            Strain(
                strain_name="s1",
                r0=dist.Normal(2.0, 0.1),
                infectious_period=dist.Normal(7.0, 0.1),
            )
        ],
        strain_interactions={"s1": {"s1": 1.0}},
    )
    with handlers.trace() as tr, handlers.seed(0):
        sample_then_resolve(tp)
    assert "strains_0_r0" in tr
    assert "strains_0_infectious_period" in tr


def test_factor_adds_to_joint_density():
    """handlers.factor (numpyro.factor parity via the Unit distribution):
    a factor-form likelihood yields the same posterior as the explicit
    observed-site form."""
    import numpy as np

    from dynode_tpu.infer import MCMC, NUTS, log_density
    from dynode_tpu.infer.util import get_model_trace

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(0.5, 1.0, 64))

    def m_factor():
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        handlers.factor(
            "lik", jnp.sum(dist.Normal(mu, 1.0).log_prob(data))
        )

    def m_obs():
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        handlers.sample("x", dist.Normal(mu, 1.0), obs=data)

    # identical joint density at a fixed latent
    lf, _ = log_density(m_factor, (), {}, {"mu": jnp.asarray(0.3)})
    lo, _ = log_density(m_obs, (), {}, {"mu": jnp.asarray(0.3)})
    assert abs(float(lf) - float(lo)) < 1e-9

    # factor site shows up in the trace as an observed Unit site
    tr = get_model_trace(m_factor, jax.random.PRNGKey(0))
    assert tr["lik"]["is_observed"]
    assert isinstance(tr["lik"]["fn"], dist.Unit)

    # identical posterior through NUTS
    mc = MCMC(NUTS(m_factor), num_warmup=150, num_samples=150, num_chains=2)
    mc.run(jax.random.PRNGKey(0))
    mu = np.asarray(mc.get_samples()["mu"])
    expected = float(data.mean()) * 64 / 65
    assert abs(mu.mean() - expected) < 0.08


def test_init_to_value_strategy():
    from dynode_tpu.infer import init_to_value
    from dynode_tpu.infer.util import get_model_trace, initialize_latents

    def m():
        handlers.sample("a", dist.Normal(0.0, 1.0))
        handlers.sample("b", dist.LogNormal(0.0, 1.0))

    tr = get_model_trace(m, jax.random.PRNGKey(0))
    strat = init_to_value({"a": 0.25})
    inits = initialize_latents(tr, jax.random.PRNGKey(1), strat)
    assert float(inits["a"]) == 0.25
    assert float(inits["b"]) > 0.0  # fallback drew something valid


def test_uncondition_resamples_observed_sites():
    """handlers.uncondition (pyro.poutine.uncondition parity): observed
    sites become fresh draws; the data is kept as _observed_value."""
    data = jnp.full((5,), 100.0)

    def m():
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        handlers.sample("x", dist.Normal(mu, 1.0), obs=data)

    with handlers.trace() as tr, handlers.seed(0), handlers.uncondition():
        m()
    assert not tr["x"]["is_observed"]
    x = np.asarray(tr["x"]["value"])
    assert x.shape == (5,)
    assert np.all(np.abs(x) < 50)  # drawn near mu, not the 100s echoed back
    np.testing.assert_array_equal(
        np.asarray(tr["x"]["_observed_value"]), np.asarray(data)
    )
    # without uncondition the site echoes the data (numpyro contract)
    with handlers.trace() as tr2, handlers.seed(0):
        m()
    assert tr2["x"]["is_observed"]
    np.testing.assert_array_equal(np.asarray(tr2["x"]["value"]), np.asarray(data))


def test_predictive_uncondition_observed_flag():
    from dynode_tpu.infer import Predictive

    data = jnp.full((4,), 100.0)

    def m(obs=None):
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        handlers.sample("x", dist.Normal(mu, 1.0), obs=obs)

    post = {"mu": jnp.zeros((8,))}
    # default: numpyro contract — observed sites echo the data back
    echo = Predictive(m, posterior_samples=post)(
        jax.random.PRNGKey(0), obs=data
    )
    assert np.all(np.asarray(echo["x"]) == 100.0)
    # uncondition_observed: genuine replicates, varying across draws
    rep = Predictive(m, posterior_samples=post, uncondition_observed=True)(
        jax.random.PRNGKey(0), obs=data
    )
    x = np.asarray(rep["x"])
    assert x.shape == (8, 4)
    assert np.all(np.abs(x) < 50)
    assert np.std(x[:, 0]) > 0.1  # distinct draws per posterior row


def test_nested_blocks_compose_hide_fns():
    """A selective inner block must not disable an outer hide-all block:
    a site the inner block passes through still stops at the outer one."""
    import dynode_tpu.dist as dist
    from dynode_tpu.infer import handlers

    import jax

    def inner():
        with handlers.block(hide_fn=lambda m: m["name"] == "secret"):
            # hidden from EVERY outer handler incl. seed -> needs its own key
            handlers.sample(
                "secret", dist.Normal(0.0, 1.0), rng_key=jax.random.PRNGKey(1)
            )
            handlers.sample("visible_inside", dist.Normal(0.0, 1.0))

    with handlers.trace() as outer_tr:
        with handlers.block():  # hide-all: the log_density-style wrapper
            with handlers.seed(0), handlers.trace() as mid_tr:
                inner()
    # the selective block hid "secret" from mid_tr but passed the other
    assert "secret" not in mid_tr and "visible_inside" in mid_tr
    # NOTHING leaks past the outer hide-all block (the old stack walk let
    # any site the innermost block passed through bypass every outer block)
    assert outer_tr == {}
