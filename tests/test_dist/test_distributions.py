"""Distribution log-prob correctness vs scipy + sampling moment checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import dynode_tpu.dist as dist
from dynode_tpu.dist.transforms import biject_to

KEY = jax.random.PRNGKey(0)


CASES = [
    (dist.Normal(1.2, 0.7), st.norm(1.2, 0.7), [-1.0, 0.5, 3.0]),
    (dist.LogNormal(0.3, 0.5), st.lognorm(s=0.5, scale=np.exp(0.3)), [0.5, 1.0, 4.0]),
    (dist.HalfNormal(2.0), st.halfnorm(scale=2.0), [0.1, 1.0, 5.0]),
    (dist.Cauchy(0.5, 1.5), st.cauchy(0.5, 1.5), [-3.0, 0.5, 7.0]),
    (dist.HalfCauchy(2.0), st.halfcauchy(scale=2.0), [0.2, 2.0, 9.0]),
    (dist.StudentT(4.0, 1.0, 2.0), st.t(4.0, 1.0, 2.0), [-2.0, 1.0, 5.0]),
    (dist.Uniform(-1.0, 3.0), st.uniform(-1.0, 4.0), [-0.5, 0.0, 2.9]),
    (dist.Exponential(1.7), st.expon(scale=1 / 1.7), [0.1, 1.0, 3.0]),
    (dist.Gamma(3.0, 2.0), st.gamma(3.0, scale=0.5), [0.4, 1.5, 4.0]),
    (dist.Beta(0.5, 0.5), st.beta(0.5, 0.5), [0.1, 0.5, 0.9]),
    (dist.Poisson(4.5), st.poisson(4.5), [0, 3, 10]),
    (dist.Binomial(10, 0.3), st.binom(10, 0.3), [0, 3, 10]),
    (dist.Bernoulli(probs=0.7), st.bernoulli(0.7), [0, 1]),
]


@pytest.mark.parametrize("d,ref,points", CASES, ids=lambda c: type(c).__name__)
def test_log_prob_matches_scipy(d, ref, points):
    for x in points:
        got = float(d.log_prob(x))
        want = (
            ref.logpmf(x) if hasattr(ref, "logpmf") and isinstance(x, int) else ref.logpdf(x)
            if hasattr(ref, "logpdf")
            else ref.logpmf(x)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_truncated_normal_log_prob():
    d = dist.TruncatedNormal(loc=8.0, scale=2.0, low=2.0, high=15.0)
    ref = st.truncnorm((2 - 8) / 2, (15 - 8) / 2, loc=8, scale=2)
    for x in [3.0, 8.0, 14.5]:
        np.testing.assert_allclose(
            float(d.log_prob(x)), ref.logpdf(x), rtol=1e-6
        )
    assert np.isneginf(float(d.log_prob(1.0)))
    assert np.isneginf(float(d.log_prob(16.0)))


def test_truncated_normal_sampling_bounds_and_mean():
    d = dist.TruncatedNormal(loc=8.0, scale=2.0, low=2.0, high=15.0)
    x = np.asarray(d.sample(KEY, (20000,)))
    assert x.min() >= 2.0 and x.max() <= 15.0
    ref = st.truncnorm((2 - 8) / 2, (15 - 8) / 2, loc=8, scale=2)
    np.testing.assert_allclose(x.mean(), ref.mean(), atol=0.05)


def test_transformed_distribution_affine_beta():
    """The reference's r0 prior: 1.5 + Beta(0.5, 0.5) (examples/sir_infer_parameters.py:47-52)."""
    d = dist.TransformedDistribution(
        dist.Beta(0.5, 0.5), dist.AffineTransform(1.5, 1.0)
    )
    x = np.asarray(d.sample(KEY, (20000,)))
    assert x.min() > 1.5 and x.max() < 2.5
    np.testing.assert_allclose(x.mean(), 2.0, atol=0.02)
    # log_prob = beta logpdf of (x - 1.5) (unit jacobian)
    np.testing.assert_allclose(
        float(d.log_prob(1.8)), st.beta(0.5, 0.5).logpdf(0.3), rtol=1e-6
    )
    # support reflects the transform
    t = biject_to(d.support)
    val = float(t(jnp.asarray(0.0)))
    assert 1.5 < val < 2.5


def test_mvn_log_prob_matches_scipy():
    loc = np.array([1.0, -2.0])
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    L = np.linalg.cholesky(cov)
    d = dist.MultivariateNormal(loc, L)
    ref = st.multivariate_normal(loc, cov)
    for x in [np.zeros(2), np.array([1.5, -1.0])]:
        np.testing.assert_allclose(float(d.log_prob(x)), ref.logpdf(x), rtol=1e-8)
    samples = np.asarray(d.sample(KEY, (30000,)))
    np.testing.assert_allclose(samples.mean(0), loc, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.08)


def test_negative_binomial_moments():
    d = dist.NegativeBinomial(mean=6.0, concentration=3.0)
    x = np.asarray(d.sample(KEY, (40000,)))
    np.testing.assert_allclose(x.mean(), 6.0, rtol=0.05)
    np.testing.assert_allclose(x.var(), 6.0 + 36.0 / 3.0, rtol=0.1)
    # normalization: probs sum to ~1
    ks = jnp.arange(0, 200)
    total = float(jnp.exp(d.log_prob(ks)).sum())
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)


@pytest.mark.parametrize(
    "d",
    [
        dist.Normal(0.0, 1.0),
        dist.Beta(2.0, 3.0),
        dist.Gamma(2.0, 1.0),
        dist.Uniform(2.0, 5.0),
        dist.TruncatedNormal(0.0, 1.0, low=-1.0, high=4.0),
    ],
)
def test_biject_to_roundtrip(d):
    t = biject_to(d.support)
    for u in [-3.0, 0.0, 2.0]:
        c = t(jnp.asarray(u))
        back = float(t.inv(c))
        np.testing.assert_allclose(back, u, rtol=1e-6, atol=1e-6)


def test_delta_distribution():
    d = dist.Delta(jnp.asarray(3.0), log_density=-1.5)
    assert float(d.sample(KEY)) == 3.0
    assert float(d.log_prob(99.0)) == -1.5


def test_dirichlet_and_stickbreaking():
    import scipy.stats as st2

    conc = np.array([2.0, 3.0, 5.0])
    d = dist.Dirichlet(conc)
    x = np.asarray(d.sample(KEY, (20000,)))
    np.testing.assert_allclose(x.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(x.mean(0), conc / conc.sum(), atol=0.01)
    pt = np.array([0.2, 0.3, 0.5])
    np.testing.assert_allclose(
        float(d.log_prob(pt)), st2.dirichlet(conc).logpdf(pt), rtol=1e-6
    )
    # stick-breaking roundtrip + jacobian sign
    t = biject_to(d.support)
    u = jnp.array([0.3, -0.7])
    p = t(u)
    np.testing.assert_allclose(float(jnp.sum(p)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t.inv(p)), np.asarray(u), atol=1e-6)
    # analytic jacobian vs autodiff
    jac = jax.jacobian(lambda v: t(v)[:-1])(u)
    np.testing.assert_allclose(
        float(t.log_abs_det_jacobian(u, p)),
        float(jnp.linalg.slogdet(jac)[1]),
        rtol=1e-6,
    )


def test_categorical_and_multinomial():
    c = dist.Categorical(probs=jnp.array([0.2, 0.3, 0.5]))
    draws = np.asarray(c.sample(KEY, (20000,)))
    freqs = np.bincount(draws, minlength=3) / 20000
    np.testing.assert_allclose(freqs, [0.2, 0.3, 0.5], atol=0.02)
    np.testing.assert_allclose(float(c.log_prob(2)), np.log(0.5), rtol=1e-6)

    m = dist.Multinomial(total_count=50, probs=jnp.array([0.2, 0.3, 0.5]))
    x = np.asarray(m.sample(KEY, (5000,)))
    assert (x.sum(-1) == 50).all()
    np.testing.assert_allclose(x.mean(0), [10, 15, 25], rtol=0.05)
    import scipy.stats as st2

    np.testing.assert_allclose(
        float(m.log_prob(jnp.array([10, 15, 25]))),
        st2.multinomial(50, [0.2, 0.3, 0.5]).logpmf([10, 15, 25]),
        rtol=1e-6,
    )


def test_nuts_over_dirichlet_site():
    """NUTS samples a simplex latent through the stick-breaking bijection."""
    from dynode_tpu.infer import MCMC, NUTS, handlers

    counts = jnp.array([12.0, 35.0, 53.0])

    def model(obs=None):
        p = handlers.sample("p", dist.Dirichlet(jnp.ones(3)))
        handlers.sample("x", dist.Multinomial(100, p), obs=obs)

    mcmc = MCMC(NUTS(model, max_tree_depth=6), num_warmup=200, num_samples=200,
                num_chains=2)
    mcmc.run(jax.random.PRNGKey(0), obs=counts)
    p = np.asarray(mcmc.get_samples()["p"])
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    # conjugate posterior mean: (counts + 1) / (100 + 3)
    np.testing.assert_allclose(p.mean(0), (np.asarray(counts) + 1) / 103, atol=0.02)


class TestBetaBinomial:
    def test_log_prob_matches_scipy(self):
        from scipy.stats import betabinom

        d = dist.BetaBinomial(2.0, 5.0, 40)
        ks = np.arange(0, 41)
        want = betabinom(40, 2.0, 5.0).logpmf(ks)
        got = np.asarray(d.log_prob(jnp.asarray(ks, dtype=jnp.float32)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_normalized_and_moments(self):
        d = dist.BetaBinomial(3.0, 4.0, 25)
        ks = jnp.arange(0, 26, dtype=jnp.float32)
        p = np.exp(np.asarray(d.log_prob(ks), dtype=np.float64))
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
        np.testing.assert_allclose((p * np.arange(26)).sum(),
                                   float(d.mean), rtol=1e-5)
        var = (p * np.arange(26) ** 2).sum() - float(d.mean) ** 2
        np.testing.assert_allclose(var, float(d.variance), rtol=1e-4)

    def test_sample_moments(self):
        d = dist.BetaBinomial(2.0, 5.0, 40)
        x = np.asarray(
            d.sample(jax.random.PRNGKey(0), (20000,)), dtype=np.float64
        )
        np.testing.assert_allclose(x.mean(), float(d.mean), rtol=0.03)
        np.testing.assert_allclose(x.var(), float(d.variance), rtol=0.08)


class TestZeroInflated:
    def test_poisson_logpmf_hand_computed(self):
        gate, rate = 0.3, 4.0
        d = dist.ZeroInflatedPoisson(gate, rate)
        from scipy.stats import poisson

        # P(0) = gate + (1-gate) e^{-rate}; P(k>0) = (1-gate) Pois(k)
        want0 = np.log(gate + (1 - gate) * np.exp(-rate))
        np.testing.assert_allclose(
            float(d.log_prob(jnp.asarray(0.0))), want0, rtol=1e-6
        )
        for k in (1, 3, 10):
            want = np.log(1 - gate) + poisson(rate).logpmf(k)
            np.testing.assert_allclose(
                float(d.log_prob(jnp.asarray(float(k)))), want, rtol=1e-6
            )

    def test_normalized(self):
        d = dist.ZeroInflatedNegativeBinomial(0.25, 6.0, 3.0)
        ks = jnp.arange(0, 400, dtype=jnp.float32)
        p = np.exp(np.asarray(d.log_prob(ks), dtype=np.float64))
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)

    def test_sample_moments_and_zero_mass(self):
        gate, rate = 0.4, 5.0
        d = dist.ZeroInflatedPoisson(gate, rate)
        x = np.asarray(
            d.sample(jax.random.PRNGKey(1), (40000,)), dtype=np.float64
        )
        np.testing.assert_allclose(x.mean(), (1 - gate) * rate, rtol=0.03)
        p0_want = gate + (1 - gate) * np.exp(-rate)
        np.testing.assert_allclose((x == 0).mean(), p0_want, rtol=0.05)

    def test_grad_through_gate_and_rate(self):
        def nll(params):
            g, r = params
            d = dist.ZeroInflatedPoisson(g, r)
            obs = jnp.asarray([0.0, 0.0, 3.0, 7.0, 0.0, 2.0])
            return -jnp.sum(d.log_prob(obs))

        g = jax.grad(nll)(jnp.asarray([0.3, 4.0]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_fit_recovers_gate(self):
        # a small NUTS fit through the zero-inflated likelihood
        from dynode_tpu.infer import MCMC, NUTS, handlers

        gate_true, rate_true = 0.35, 6.0
        obs = dist.ZeroInflatedPoisson(gate_true, rate_true).sample(
            jax.random.PRNGKey(2), (400,)
        )

        def model(obs=None):
            gate = handlers.sample("gate", dist.Beta(2.0, 2.0))
            rate = handlers.sample("rate", dist.Gamma(2.0, 0.5))
            handlers.sample(
                "obs", dist.ZeroInflatedPoisson(gate, rate), obs=obs
            )

        m = MCMC(NUTS(model), num_warmup=200, num_samples=200, num_chains=4)
        m.run(jax.random.PRNGKey(0), obs=jnp.asarray(obs, dtype=jnp.float32))
        s = m.get_samples()
        np.testing.assert_allclose(
            np.asarray(s["gate"], dtype=np.float64).mean(), gate_true,
            atol=0.07,
        )
        np.testing.assert_allclose(
            np.asarray(s["rate"], dtype=np.float64).mean(), rate_true,
            rtol=0.08,
        )
