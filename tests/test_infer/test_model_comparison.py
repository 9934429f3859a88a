"""PSIS-LOO / WAIC / compare against exact analytic oracles.

The LOO oracle is the normal-normal conjugate model, where the exact
leave-one-out predictive p(y_i | y_{-i}) is available in closed form —
so PSIS-LOO is checked against truth, not against itself (the same
non-circularity standard as tests/test_dynamics/test_scipy_oracle.py).
"""

import numpy as np
import pytest

from dynode_tpu.infer import ELPDData, compare, loo, psislw, waic
from dynode_tpu.infer.model_comparison import _gpd_fit, _gpd_quantiles


def _normal_logpdf(y, mu, sigma):
    return -0.5 * np.log(2 * np.pi) - np.log(sigma) - 0.5 * ((y - mu) / sigma) ** 2


def _conjugate_setup(seed=0, n_obs=40, sigma=1.0, mu0=0.0, tau0=5.0):
    """y_i ~ N(theta, sigma^2), theta ~ N(mu0, tau0^2): exact posterior,
    exact LOO predictives, and an iid posterior-draw loglik matrix."""
    rng = np.random.default_rng(seed)
    theta_true = 1.3
    y = rng.normal(theta_true, sigma, size=n_obs)

    def posterior(ys):
        prec = 1.0 / tau0**2 + len(ys) / sigma**2
        mean = (mu0 / tau0**2 + ys.sum() / sigma**2) / prec
        return mean, np.sqrt(1.0 / prec)

    # exact elpd_loo: sum_i log N(y_i; mu_{-i}, sigma^2 + tau_{-i}^2)
    elpd_exact = 0.0
    for i in range(n_obs):
        m, t = posterior(np.delete(y, i))
        elpd_exact += _normal_logpdf(y[i], m, np.sqrt(sigma**2 + t**2))

    m_full, t_full = posterior(y)
    draws = rng.normal(m_full, t_full, size=8000)
    ll = _normal_logpdf(y[None, :], draws[:, None], sigma)  # (S, N)
    return y, ll, float(elpd_exact)


def test_gpd_fit_recovers_shape_and_scale():
    # deterministic GPD sample via the inverse cdf on a quantile grid
    k_true, sigma_true = 0.3, 1.5
    p = (np.arange(1, 2001) - 0.5) / 2000.0
    x = np.sort(_gpd_quantiles(p, k_true, sigma_true))
    k_hat, sigma_hat = _gpd_fit(x)
    assert abs(k_hat - k_true) < 0.05
    assert abs(sigma_hat - sigma_true) / sigma_true < 0.1


def test_gpd_quantiles_zero_shape_is_exponential():
    p = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        _gpd_quantiles(p, 0.0, 2.0), -2.0 * np.log1p(-p), rtol=1e-12
    )


def test_psislw_normalizes_and_flags_good_tails():
    _, ll, _ = _conjugate_setup()
    lw, ks = psislw(-ll)
    # each column self-normalizes
    tot = np.exp(lw).sum(axis=0)
    np.testing.assert_allclose(tot, 1.0, rtol=1e-10)
    # well-behaved model: every tail reliable
    assert np.all(ks < 0.7)
    # no single weight above 1
    assert lw.max() <= 1e-12


def test_psis_loo_matches_exact_conjugate_loo():
    _, ll, elpd_exact = _conjugate_setup()
    res = loo(ll)
    assert isinstance(res, ELPDData)
    assert res.kind == "loo"
    assert res.n_data_points == ll.shape[1]
    # truth within the estimator's own standard error (plus MC slack)
    assert abs(res.elpd - elpd_exact) < max(2.0 * res.se, 0.5)
    # one global parameter => p_loo ~ 1
    assert 0.3 < res.p < 2.5
    assert not res.warning


def test_waic_agrees_with_loo_on_well_behaved_model():
    _, ll, elpd_exact = _conjugate_setup()
    res = waic(ll)
    assert res.kind == "waic"
    assert abs(res.elpd - elpd_exact) < max(2.0 * res.se, 0.5)
    assert abs(res.elpd - loo(ll).elpd) < 0.5
    assert not res.warning


def test_loo_accepts_site_dict_and_concatenates():
    _, ll, _ = _conjugate_setup()
    whole = loo(ll)
    split = loo({"a": ll[:, :10], "b": ll[:, 10:]})
    np.testing.assert_allclose(split.elpd, whole.elpd, rtol=1e-10)
    assert split.n_data_points == whole.n_data_points


def test_loo_accepts_inference_data():
    from dynode_tpu.infer import from_dynode

    _, ll, _ = _conjugate_setup()
    idata = from_dynode(log_likelihood={"obs": ll})
    np.testing.assert_allclose(loo(idata).elpd, loo(ll).elpd, rtol=1e-12)


def test_loo_warns_on_heavy_tailed_ratios():
    # proposal (posterior draws) much wider than the likelihood ->
    # importance ratios are lognormal-heavy: pareto_k should blow past 0.7
    rng = np.random.default_rng(3)
    draws = rng.normal(0.0, 1.0, size=4000)
    ll = _normal_logpdf(0.0, draws[:, None], 0.05)  # (S, 1)
    with pytest.warns(UserWarning, match="pareto_k"):
        res = loo(ll)
    assert res.warning
    assert res.pareto_k[0] > 0.7


def test_compare_ranks_true_model_first():
    y, ll_true, _ = _conjugate_setup()
    # misspecified competitor: same posterior draws but wrong obs noise
    rng = np.random.default_rng(1)
    draws = rng.normal(np.mean(y), 0.2, size=8000)
    ll_bad = _normal_logpdf(y[None, :], draws[:, None], 4.0)  # sigma 4x off
    table = compare({"bad": ll_bad, "true": ll_true})
    names = list(table)
    assert names[0] == "true"
    assert table["true"]["rank"] == 0
    assert table["true"]["elpd_diff"] == 0.0
    assert table["bad"]["elpd_diff"] > 0.0
    assert table["bad"]["dse"] > 0.0
    assert table["true"]["weight"] > table["bad"]["weight"]
    # paired dse is the honest yardstick: must be finite and positive
    assert np.isfinite(table["bad"]["dse"])


def test_compare_accepts_precomputed_elpddata_and_rejects_mixed():
    _, ll, _ = _conjugate_setup()
    r1, r2 = loo(ll), waic(ll)
    with pytest.raises(AssertionError, match="criteria"):
        compare({"a": r1, "b": r2})
    table = compare({"a": r1, "b": loo(ll * 1.0)})
    assert set(table) == {"a", "b"}


def test_compare_rejects_mismatched_observation_sets():
    _, ll, _ = _conjugate_setup()
    with pytest.raises(AssertionError, match="observation"):
        compare({"a": ll, "b": ll[:, :5]})


def test_loo_pit_uniform_when_calibrated_u_shaped_when_overconfident():
    from dynode_tpu.infer import loo_pit

    rng = np.random.default_rng(11)
    n_obs, s = 400, 2000
    sigma, tau0 = 1.0, 5.0
    y = rng.normal(0.7, sigma, size=n_obs)
    prec = 1.0 / tau0**2 + n_obs / sigma**2
    m_post = (y.sum() / sigma**2) / prec
    draws = rng.normal(m_post, np.sqrt(1.0 / prec), size=s)
    ll = _normal_logpdf(y[None, :], draws[:, None], sigma)

    # calibrated replicates: y_rep ~ N(theta_s, sigma)
    y_rep = rng.normal(draws[:, None], sigma, size=(s, n_obs))
    pit = loo_pit(y, y_rep, ll)
    assert pit.shape == (n_obs,)
    assert np.all((pit >= 0) & (pit <= 1))
    # ~Uniform(0,1): mean 1/2, var 1/12, tails populated
    assert abs(pit.mean() - 0.5) < 0.05
    assert abs(pit.var() - 1.0 / 12.0) < 0.02
    assert (pit < 0.1).mean() > 0.04 and (pit > 0.9).mean() > 0.04

    # overconfident replicates (predictive 5x too narrow): mass piles at
    # the PIT extremes (the U-shape diagnostic)
    y_rep_narrow = rng.normal(draws[:, None], sigma / 5.0, size=(s, n_obs))
    pit_narrow = loo_pit(y, y_rep_narrow, ll)
    extreme = ((pit_narrow < 0.1) | (pit_narrow > 0.9)).mean()
    assert extreme > 3 * ((pit < 0.1) | (pit > 0.9)).mean()


def test_reff_from_chains_autocorrelated_draws():
    # perfectly iid chains -> reff ~ 1; sticky AR(1) chains -> reff << 1
    rng = np.random.default_rng(7)
    y = rng.normal(size=10)
    iid = rng.normal(1.0, 0.3, size=4000)
    ar = np.empty(4000)
    ar[0] = 0.0
    for t in range(1, 4000):
        ar[t] = 0.995 * ar[t - 1] + np.sqrt(1 - 0.995**2) * rng.normal()
    ar = 1.0 + 0.3 * ar
    ll_iid = _normal_logpdf(y[None, :], iid[:, None], 1.0)
    ll_ar = _normal_logpdf(y[None, :], ar[:, None], 1.0)
    from dynode_tpu.infer.model_comparison import _reff_from_chains

    r_iid = _reff_from_chains(ll_iid, n_chains=4)
    r_ar = _reff_from_chains(ll_ar, n_chains=4)
    assert r_iid > 0.5
    assert r_ar < 0.2
    # loo still runs under the reduced efficiency (larger tail)
    res = loo(ll_ar, n_chains=4)
    assert np.isfinite(res.elpd)


def test_constant_loglik_columns_do_not_warn():
    """Masked observations zero their log-lik columns; PSIS has no tail to
    fit there (plain IS is exact) -- pareto_k must be benign (-inf), not
    the inf that flags a healthy fit unreliable."""
    rng = np.random.default_rng(0)
    ll = rng.normal(-1.0, 0.3, size=(400, 6))
    ll[:, 2] = 0.0  # masked column
    ll[:, 5] = -3.7  # constant but nonzero (fully-determined obs)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")  # any PSIS warning fails the test
        res = loo(ll)
    assert res.pareto_k[2] == -np.inf and res.pareto_k[5] == -np.inf
    assert np.all(np.isfinite(np.delete(res.pareto_k, [2, 5])))
    assert not res.warning
    # the constant column's elpd_i is exactly its constant log-lik
    assert res.elpd_i[2] == pytest.approx(0.0, abs=1e-12)
    assert res.elpd_i[5] == pytest.approx(-3.7, abs=1e-9)
