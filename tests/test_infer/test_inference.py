"""MCMC/SVI engines + process classes on a fast conjugate model
(spec: reference tests/test_infer/test_inference_processes.py, which uses the
same trivial Normal-mean fixture so inference plumbing tests run in seconds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dynode_tpu.dist as dist
from dynode_tpu.infer import (
    MCMC,
    MCMCProcess,
    NUTS,
    Predictive,
    SVIProcess,
    handlers,
    log_likelihood,
)

np.random.seed(0)
DATA = jnp.asarray(np.random.randn(128) + 0.7)
XBAR = float(np.mean(np.asarray(DATA)))


def toy_model(obs=None):
    mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
    sigma = handlers.sample("sigma", dist.LogNormal(0.0, 0.5))
    handlers.sample("x", dist.Normal(mu, sigma), obs=obs)


@pytest.fixture(scope="module")
def mcmc_process():
    proc = MCMCProcess(
        numpyro_model=toy_model,
        num_samples=200,
        num_warmup=200,
        num_chains=2,
        nuts_max_tree_depth=8,
        progress_bar=False,
    )
    proc.infer(obs=DATA)
    return proc


@pytest.fixture(scope="module")
def svi_process():
    proc = SVIProcess(
        numpyro_model=toy_model,
        num_iterations=600,
        num_samples=150,
        progress_bar=False,
    )
    proc.infer(obs=DATA)
    return proc


def test_mcmc_sample_shapes(mcmc_process):
    flat = mcmc_process.get_samples()
    assert flat["mu"].shape == (400,)
    by_chain = mcmc_process.get_samples(group_by_chain=True)
    assert by_chain["mu"].shape == (2, 200)


def test_mcmc_posterior_close_to_conjugate(mcmc_process):
    mu = np.asarray(mcmc_process.get_samples()["mu"])
    expected = XBAR * 128 / 129  # conjugate posterior mean (sigma ~ 1)
    assert abs(mu.mean() - expected) < 0.03
    assert 0.06 < mu.std() < 0.13


def test_mcmc_requires_infer_first():
    proc = MCMCProcess(
        numpyro_model=toy_model,
        num_samples=10,
        num_warmup=10,
        num_chains=1,
        nuts_max_tree_depth=5,
    )
    with pytest.raises(AssertionError):
        proc.get_samples()
    with pytest.raises(AssertionError):
        proc.to_arviz()


def test_mcmc_extra_fields_and_last_state(mcmc_process):
    ef = mcmc_process._inferer.get_extra_fields(group_by_chain=True)
    assert ef["accept_prob"].shape == (2, 200)
    assert mcmc_process._inference_state is not None
    assert mcmc_process._inference_state.z.shape[0] == 2  # per-chain state


def test_mcmc_to_arviz(mcmc_process):
    idata = mcmc_process.to_arviz()
    assert idata.posterior["mu"].shape == (2, 200)
    assert "x" in idata.posterior_predictive
    assert "mu" in idata.prior
    stats = idata.summary()
    assert stats["mu"]["r_hat"] < 1.05
    assert stats["mu"]["n_eff"] > 50
    # az.from_numpyro group parity: pointwise log-lik + observed data
    assert idata.log_likelihood["x"].shape == (400, 128)
    np.testing.assert_array_equal(idata.observed_data["x"], np.asarray(DATA))
    # the predictive group holds genuine replicates (resampled observed
    # sites), not the data echoed back, and they vary across draws
    ppc = np.asarray(idata.posterior_predictive["x"])
    assert ppc.shape == (400, 128)
    assert not np.array_equal(ppc[0], np.asarray(DATA))
    assert np.std(ppc[:, 0]) > 0.1


def test_mcmc_idata_loo_pit_is_calibrated(mcmc_process):
    """Well-specified model: PSIS-weighted LOO-PIT ~ Uniform(0, 1)."""
    from dynode_tpu.infer import loo_pit

    idata = mcmc_process.to_arviz()
    pit = loo_pit(
        idata.observed_data["x"], idata.posterior_predictive["x"], idata
    )
    assert pit.shape == (128,)
    assert abs(pit.mean() - 0.5) < 0.1
    assert abs(pit.var() - 1.0 / 12.0) < 0.04


def test_mcmc_idata_feeds_loo_and_waic(mcmc_process):
    """The export chains straight into model comparison (az.loo parity)."""
    from dynode_tpu.infer import compare, loo, waic

    idata = mcmc_process.to_arviz()
    r_loo = loo(idata, n_chains=2)
    r_waic = waic(idata)
    assert r_loo.n_data_points == 128
    assert np.all(r_loo.pareto_k < 0.7)
    # both estimate the same elpd on this well-behaved posterior
    assert abs(r_loo.elpd - r_waic.elpd) < 1.0
    table = compare({"m": r_loo})
    assert table["m"]["rank"] == 0


def test_idata_npz_roundtrip(mcmc_process, tmp_path):
    """to_npz/from_npz (the arviz to_netcdf analog) preserves every group."""
    import numpy as np

    idata = mcmc_process.to_arviz()
    idata.attrs["model_name"] = "toy"
    idata.attrs["seed"] = 7
    path = str(tmp_path / "fit.npz")
    idata.to_npz(path)
    back = type(idata).from_npz(path)
    assert set(back.groups()) == set(idata.groups())
    for g in idata.groups():
        a, b = getattr(idata, g), getattr(back, g)
        assert set(a) == set(b)
        for site in a:
            np.testing.assert_array_equal(np.asarray(a[site]), b[site])
    assert back.attrs == {"model_name": "toy", "seed": 7}
    assert back.summary()["mu"]["r_hat"] < 1.05


def test_idata_to_real_arviz(mcmc_process):
    """Ecosystem interop: build a genuine az.InferenceData when arviz is
    installed (reference behavior:
    /root/reference/src/dynode/infer/inference.py:237-241). Skipped in
    environments without arviz; the raise-path is asserted separately."""
    az = pytest.importorskip("arviz")

    idata = mcmc_process.to_arviz()
    idata.attrs["model_name"] = "toy"
    az_idata = idata.to_arviz()
    assert isinstance(az_idata, az.InferenceData)
    assert az_idata.posterior["mu"].shape == (2, 200)
    assert az_idata.posterior_predictive["x"].shape[:2] == (1, 400)
    assert az_idata.posterior.attrs["model_name"] == "toy"
    # the whole arviz toolchain must accept it
    summ = az.summary(az_idata)
    assert "mu" in summ.index


def test_idata_to_arviz_raises_without_arviz(mcmc_process, monkeypatch):
    import builtins

    # force the import failure regardless of environment
    real_import = builtins.__import__

    def no_arviz(name, *a, **k):
        if name == "arviz":
            raise ImportError("arviz absent (test)")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_arviz)
    idata = mcmc_process.to_arviz()
    with pytest.raises(ImportError, match="to_npz"):
        idata.to_arviz()


def test_svi_sample_shapes_and_filtering(svi_process):
    samples = svi_process.get_samples()
    assert set(samples) == {"mu", "sigma"}  # _auto_latent filtered out
    assert samples["mu"].shape == (150,)


def test_svi_posterior_reasonable(svi_process):
    mu = np.asarray(svi_process.get_samples()["mu"])
    assert abs(mu.mean() - XBAR * 128 / 129) < 0.1


def test_svi_to_arviz(svi_process):
    idata = svi_process.to_arviz()
    assert "x" in idata.posterior_predictive
    assert "x" in idata.log_likelihood
    assert idata.log_likelihood["x"].shape == (150, 128)


def test_deterministic_sites_via_get_samples():
    def model_with_det(obs=None):
        mu = handlers.sample("mu", dist.Normal(0.0, 1.0))
        handlers.deterministic("mu_sq", mu**2)
        handlers.sample("x", dist.Normal(mu, 1.0), obs=obs)

    proc = MCMCProcess(
        numpyro_model=model_with_det,
        num_samples=50,
        num_warmup=50,
        num_chains=1,
        nuts_max_tree_depth=6,
        progress_bar=False,
    )
    proc.infer(obs=DATA)
    plain = proc.get_samples()
    assert "mu_sq" not in plain
    withdet = proc.get_samples(exclude_deterministic=False)
    np.testing.assert_allclose(
        np.asarray(withdet["mu_sq"]), np.asarray(withdet["mu"]) ** 2, rtol=1e-6
    )


def test_predictive_prior_and_posterior():
    prior = Predictive(toy_model, num_samples=40)(jax.random.PRNGKey(0), obs=None)
    assert prior["mu"].shape == (40,)
    post = {"mu": jnp.zeros(10), "sigma": jnp.ones(10)}
    pp = Predictive(toy_model, posterior_samples=post)(
        jax.random.PRNGKey(0), obs=None
    )
    assert pp["x"].shape == (10,)
    assert "mu" not in pp  # provided sites are not replayed


def test_log_likelihood_shapes():
    post = {"mu": jnp.zeros(7), "sigma": jnp.ones(7)}
    ll = log_likelihood(toy_model, post, obs=DATA)
    assert ll["x"].shape == (7, 128)
    # value spot check: standard normal logpdf at the data
    expect = -0.5 * np.asarray(DATA) ** 2 - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(ll["x"][0]), expect, rtol=1e-6)


def test_mcmc_vectorized_chains_differ():
    mcmc = MCMC(
        NUTS(toy_model, max_tree_depth=6),
        num_warmup=60,
        num_samples=60,
        num_chains=3,
    )
    mcmc.run(jax.random.PRNGKey(7), obs=DATA)
    by_chain = mcmc.get_samples(group_by_chain=True)["mu"]
    # chains explore independently
    assert not np.allclose(by_chain[0], by_chain[1])


def test_mcmc_process_chained_inference(mcmc_process):
    """Process-level warm_start: a second process re-fits with zero warmup
    from the first's state (the reference keeps last_state exactly for
    'chained inference of subsequent inferers')."""
    warm = mcmc_process.warm_start_state()
    refit = MCMCProcess(
        numpyro_model=toy_model,
        num_samples=200,
        num_warmup=1,  # ignored under warm_start (warmup skipped)
        num_chains=2,
        nuts_max_tree_depth=8,
        progress_bar=False,
    )
    refit.infer(warm_start=warm, obs=DATA)
    a = np.asarray(mcmc_process.get_samples()["mu"], dtype=np.float64)
    b = np.asarray(refit.get_samples()["mu"], dtype=np.float64)
    # same posterior, fresh draws
    assert abs(a.mean() - b.mean()) < 6.0 * a.std() / np.sqrt(len(a) / 10)
    assert not np.allclose(a, b)


def test_mcmc_process_warm_start_requires_infer():
    proc = MCMCProcess(
        numpyro_model=toy_model,
        num_samples=10,
        num_warmup=10,
        num_chains=2,
        nuts_max_tree_depth=5,
        progress_bar=False,
    )
    with pytest.raises(AssertionError, match="call infer"):
        proc.warm_start_state()


def test_mcmc_process_chained_segments_use_fresh_randomness():
    """Same-process chained segments must not replay each other's
    transition stream: two successive warm re-fits from the SAME saved
    state and identical configs must produce different draws (the key is
    folded with a per-call counter after the first infer())."""
    proc = MCMCProcess(
        numpyro_model=toy_model,
        num_samples=50,
        num_warmup=100,
        num_chains=2,
        nuts_max_tree_depth=6,
        progress_bar=False,
    )
    proc.infer(obs=DATA)
    warm = proc.warm_start_state()
    proc.infer(warm_start=warm, obs=DATA)
    seg2 = np.asarray(proc.get_samples()["mu"], dtype=np.float64)
    proc.infer(warm_start=warm, obs=DATA)  # same start state, call #3
    seg3 = np.asarray(proc.get_samples()["mu"], dtype=np.float64)
    assert not np.allclose(seg2, seg3)


def test_warm_start_width_mismatch_is_loud():
    from dynode_tpu.infer import MCMC, NUTS

    m1 = MCMC(
        NUTS(toy_model, max_tree_depth=5),
        num_warmup=20,
        num_samples=10,
        num_chains=2,
        progress_bar=False,
    )
    m1.run(jax.random.PRNGKey(0), obs=DATA)
    warm = m1.warm_start_state()
    m2 = MCMC(
        NUTS(toy_model, max_tree_depth=5),
        num_warmup=0,
        num_samples=10,
        num_chains=4,
        progress_bar=False,
    )
    with pytest.raises(ValueError, match="width mismatch"):
        m2.run(jax.random.PRNGKey(1), obs=DATA, warm_start=warm)


def test_predictive_rejects_guide_plus_posterior_samples():
    from dynode_tpu.infer import AutoNormal, Predictive

    g = AutoNormal(toy_model)
    with pytest.raises(ValueError, match="not both"):
        Predictive(
            toy_model,
            posterior_samples={"mu": np.zeros(4)},
            guide=g,
            params={},
        )


def test_predictive_sequential_matches_vectorized(mcmc_process):
    from dynode_tpu.infer import Predictive

    samples = mcmc_process.get_samples()
    kw = dict(posterior_samples=samples, uncondition_observed=True)
    key = jax.random.PRNGKey(3)
    vec = Predictive(toy_model, parallel=True, **kw)(key, obs=DATA)
    seq = Predictive(toy_model, parallel=False, **kw)(key, obs=DATA)
    np.testing.assert_allclose(
        np.asarray(vec["x"]), np.asarray(seq["x"]), rtol=1e-6
    )


def test_log_likelihood_missing_latent_is_loud(mcmc_process):
    from dynode_tpu.infer import log_likelihood

    samples = dict(mcmc_process.get_samples())
    samples.pop("sigma")  # filtered dict: sigma would be drawn from the prior
    with pytest.raises(ValueError, match="sigma"):
        log_likelihood(toy_model, samples, obs=DATA)
