"""Discrete distributions (observation-noise models).

The reference's flagship inference example observes Poisson incidence
(examples/sir_infer_parameters.py:33-38); NegativeBinomial is the common
over-dispersed alternative in this model family.
"""

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from . import constraints as C
from .distribution import Distribution


def _f(x):
    return jnp.asarray(x, dtype=jnp.result_type(float))


class Poisson(Distribution):
    """Poisson counts with mean ``rate``."""
    support = C.integer_nonnegative

    def __init__(self, rate):
        self.rate = rate
        self._batch_shape = self._broadcast_batch_shape(rate)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.poisson(key, _f(self.rate), shape)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        k, lam = _f(value), _f(self.rate)
        return k * jnp.log(lam) - lam - jsp.gammaln(k + 1.0)

    @property
    def mean(self):
        """Mean of the distribution."""
        return _f(self.rate)

    @property
    def variance(self):
        """Variance of the distribution."""
        return _f(self.rate)


class Bernoulli(Distribution):
    """Bernoulli trials parameterized by ``probs`` or ``logits``."""
    support = C.IntegerInterval(0, 1)

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs or logits")
        self._probs = probs
        self._logits = logits
        self._batch_shape = self._broadcast_batch_shape(
            probs if probs is not None else logits
        )

    @property
    def probs(self):
        """Probability parameterization (derived from logits if needed)."""
        if self._probs is not None:
            return _f(self._probs)
        return jax.nn.sigmoid(_f(self._logits))

    @property
    def logits(self):
        """Logit parameterization (derived from probs if needed)."""
        if self._logits is not None:
            return _f(self._logits)
        p = _f(self._probs)
        return jnp.log(p) - jnp.log1p(-p)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(key, self.probs, shape).astype(jnp.int32)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        logits = self.logits
        v = _f(value)
        # -softplus(-logits) = log sigmoid(logits)
        return v * (-jnp.logaddexp(0.0, -logits)) + (1.0 - v) * (
            -jnp.logaddexp(0.0, logits)
        )

    @property
    def mean(self):
        """Mean of the distribution."""
        return self.probs


class Binomial(Distribution):
    """Successes in ``total_count`` Bernoulli trials."""
    def __init__(self, total_count, probs):
        self.total_count, self.probs = total_count, probs
        self._batch_shape = self._broadcast_batch_shape(total_count, probs)
        self.support = C.IntegerInterval(0, None)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.binomial(
            key, _f(self.total_count), _f(self.probs), shape
        ).astype(jnp.int32)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        n, p, k = _f(self.total_count), _f(self.probs), _f(value)
        log_comb = jsp.gammaln(n + 1.0) - jsp.gammaln(k + 1.0) - jsp.gammaln(n - k + 1.0)
        return log_comb + k * jnp.log(p) + (n - k) * jnp.log1p(-p)

    @property
    def mean(self):
        """Mean of the distribution."""
        return _f(self.total_count) * _f(self.probs)


class NegativeBinomial(Distribution):
    """Gamma-Poisson mixture with mean ``mean`` and concentration ``concentration``.

    variance = mean + mean^2 / concentration.
    """

    support = C.integer_nonnegative

    def __init__(self, mean, concentration):
        self._mean_param = mean
        self.concentration = concentration
        self._batch_shape = self._broadcast_batch_shape(mean, concentration)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        k_gamma, k_pois = jax.random.split(key)
        r, mu = _f(self.concentration), _f(self._mean_param)
        g = jax.random.gamma(k_gamma, jnp.broadcast_to(r, shape)) * (mu / r)
        return jax.random.poisson(k_pois, g, shape)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        r, mu, k = _f(self.concentration), _f(self._mean_param), _f(value)
        log_p = jnp.log(mu) - jnp.log(mu + r)  # success prob of each count
        log_1mp = jnp.log(r) - jnp.log(mu + r)
        return (
            jsp.gammaln(k + r)
            - jsp.gammaln(r)
            - jsp.gammaln(k + 1.0)
            + r * log_1mp
            + k * log_p
        )

    @property
    def mean(self):
        """Mean of the distribution."""
        return _f(self._mean_param)

    @property
    def variance(self):
        """Variance of the distribution."""
        mu, r = _f(self._mean_param), _f(self.concentration)
        return mu + mu * mu / r


class Categorical(Distribution):
    """Categorical over {0..K-1} from probs or logits."""

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs or logits")
        if logits is None:
            logits = jnp.log(_f(probs))
        self._logits = jnp.asarray(logits, dtype=jnp.result_type(float))
        self._batch_shape = self._logits.shape[:-1]
        self.support = C.IntegerInterval(0, self._logits.shape[-1] - 1)

    @property
    def logits(self):
        """Logit parameterization (derived from probs if needed)."""
        return self._logits - jax.nn.logsumexp(self._logits, axis=-1, keepdims=True)

    @property
    def probs(self):
        """Probability parameterization (derived from logits if needed)."""
        return jax.nn.softmax(self._logits, axis=-1)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, self._logits, shape=shape)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        norm = self.logits
        value = jnp.asarray(value, dtype=jnp.int32)
        return jnp.take_along_axis(norm, value[..., None], axis=-1)[..., 0]

    @property
    def mean(self):
        """Mean of the distribution."""
        k = self._logits.shape[-1]
        return jnp.sum(self.probs * jnp.arange(k), axis=-1)


class Multinomial(Distribution):
    """Multinomial counts over K categories (event shape (K,))."""

    def __init__(self, total_count, probs):
        self.total_count = total_count
        self.probs = probs
        p = jnp.asarray(probs)
        self._event_shape = p.shape[-1:]
        self._batch_shape = jnp.broadcast_shapes(
            jnp.shape(total_count), p.shape[:-1]
        )
        self.support = C.IntegerInterval(0, None)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        n = int(self.total_count) if jnp.ndim(self.total_count) == 0 else None
        if n is None:
            raise NotImplementedError(
                "Multinomial.sample requires a scalar total_count"
            )
        # sequential binomial decomposition (K is small in this domain)
        p = jnp.broadcast_to(_f(self.probs), shape + self.event_shape)
        remaining = jnp.full(shape, float(n))
        rem_p = jnp.ones(shape)
        counts = []
        k = p.shape[-1]
        for i in range(k - 1):
            key, sub = jax.random.split(key)
            frac = jnp.clip(p[..., i] / jnp.maximum(rem_p, 1e-12), 0.0, 1.0)
            c = jax.random.binomial(sub, remaining, frac)
            counts.append(c)
            remaining = remaining - c
            rem_p = rem_p - p[..., i]
        counts.append(remaining)
        return jnp.stack(counts, axis=-1).astype(jnp.int32)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        n = _f(self.total_count)
        k = _f(value)
        p = _f(self.probs)
        return (
            jsp.gammaln(n + 1.0)
            - jnp.sum(jsp.gammaln(k + 1.0), axis=-1)
            + jnp.sum(k * jnp.log(p), axis=-1)
        )

    @property
    def mean(self):
        """Mean of the distribution."""
        return _f(self.total_count)[..., None] * _f(self.probs)


__all__ = [
    "Poisson",
    "Bernoulli",
    "Binomial",
    "NegativeBinomial",
    "Categorical",
    "Multinomial",
]


class BetaBinomial(Distribution):
    """``total_count`` trials with ``p ~ Beta(c1, c0)``: overdispersed
    binomial counts (test-positivity panels, severity fractions).

    mean = n*c1/(c1+c0); variance exceeds the binomial's by the factor
    (c1+c0+n)/(c1+c0+1).
    """

    def __init__(self, concentration1, concentration0, total_count):
        self.concentration1 = concentration1
        self.concentration0 = concentration0
        self.total_count = total_count
        self._batch_shape = self._broadcast_batch_shape(
            concentration1, concentration0, total_count
        )
        self.support = C.IntegerInterval(0, None)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        k_beta, k_binom = jax.random.split(key)
        p = jax.random.beta(
            k_beta, _f(self.concentration1), _f(self.concentration0), shape
        )
        return jax.random.binomial(
            k_binom, _f(self.total_count), p, shape
        ).astype(jnp.int32)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        a, b = _f(self.concentration1), _f(self.concentration0)
        n, k = _f(self.total_count), _f(value)

        def betaln(x, y):
            return jsp.gammaln(x) + jsp.gammaln(y) - jsp.gammaln(x + y)

        log_comb = (
            jsp.gammaln(n + 1.0)
            - jsp.gammaln(k + 1.0)
            - jsp.gammaln(n - k + 1.0)
        )
        return log_comb + betaln(k + a, n - k + b) - betaln(a, b)

    @property
    def mean(self):
        """Mean of the distribution."""
        a, b = _f(self.concentration1), _f(self.concentration0)
        return _f(self.total_count) * a / (a + b)

    @property
    def variance(self):
        """Variance of the distribution."""
        a, b = _f(self.concentration1), _f(self.concentration0)
        n = _f(self.total_count)
        s = a + b
        return n * a * b * (s + n) / (s * s * (s + 1.0))


class ZeroInflatedDistribution(Distribution):
    """Mix a point mass at zero (probability ``gate``) into a count model.

    Surveillance series with reporting dropouts: P(0) = gate +
    (1-gate) * base.P(0); elsewhere (1-gate) * base.P(k).
    """

    def __init__(self, base_dist, *, gate):
        self.base_dist = base_dist
        self.gate = gate
        self._batch_shape = jnp.broadcast_shapes(
            base_dist.batch_shape, jnp.shape(gate)
        )
        self.support = base_dist.support

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        k_gate, k_base = jax.random.split(key)
        dropped = jax.random.bernoulli(
            k_gate, jnp.broadcast_to(_f(self.gate), shape)
        )
        draws = jnp.broadcast_to(self.base_dist.sample(k_base, sample_shape), shape)
        return jnp.where(dropped, jnp.zeros_like(draws), draws)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        gate = _f(self.gate)
        log_gate, log1m_gate = jnp.log(gate), jnp.log1p(-gate)
        lp_base = self.base_dist.log_prob(value)
        lp_zero = jnp.logaddexp(
            log_gate,
            log1m_gate + self.base_dist.log_prob(jnp.zeros_like(_f(value))),
        )
        return jnp.where(_f(value) == 0.0, lp_zero, log1m_gate + lp_base)

    @property
    def mean(self):
        """Mean of the distribution."""
        return (1.0 - _f(self.gate)) * self.base_dist.mean


def ZeroInflatedPoisson(gate, rate):
    """numpyro-parity constructor: ``ZeroInflatedPoisson(gate, rate)``."""
    return ZeroInflatedDistribution(Poisson(rate), gate=gate)


def ZeroInflatedNegativeBinomial(gate, mean, concentration):
    """Zero-inflated Gamma-Poisson (dropout + overdispersion together)."""
    return ZeroInflatedDistribution(
        NegativeBinomial(mean, concentration), gate=gate
    )
