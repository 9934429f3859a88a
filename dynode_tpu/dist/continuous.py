"""Continuous distributions (pure-JAX log densities and samplers)."""

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from . import constraints as C
from .distribution import Distribution

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _f(x):
    return jnp.asarray(x, dtype=jnp.result_type(float))


def _log_diff_ndtr(a, b):
    """log(Phi(b) - Phi(a)) for a < b, stable when both bounds share a tail.

    Direct ``log(ndtr(b) - ndtr(a))`` cancels to log(0) when both bounds sit
    in the far right tail (ADVICE r1). Work in log space: in the right tail
    use the symmetric form Phi(b) - Phi(a) = Phi(-a) - Phi(-b), so the
    difference is between two *small* quantities held in log representation.
    """
    right = a > 0.0
    big = jnp.where(right, jsp.log_ndtr(-a), jsp.log_ndtr(b))
    small = jnp.where(right, jsp.log_ndtr(-b), jsp.log_ndtr(a))
    # log(exp(big) - exp(small)) = big + log1p(-exp(small - big));
    # small=-inf (one-sided truncation) gives exp(-inf)=0 exactly.
    return big + jnp.log1p(-jnp.exp(small - big))


class Normal(Distribution):
    """Gaussian with location ``loc`` and scale ``scale``."""
    support = C.real

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        self._batch_shape = self._broadcast_batch_shape(loc, scale)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return _f(self.loc) + _f(self.scale) * eps

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        z = (_f(value) - _f(self.loc)) / _f(self.scale)
        return -0.5 * z * z - jnp.log(_f(self.scale)) - _LOG_SQRT_2PI

    @property
    def mean(self):
        """Mean of the distribution."""
        return jnp.broadcast_to(_f(self.loc), self.batch_shape)

    @property
    def variance(self):
        """Variance of the distribution."""
        return jnp.broadcast_to(_f(self.scale) ** 2, self.batch_shape)


class LogNormal(Distribution):
    """Distribution of ``exp(X)`` for ``X ~ Normal(loc, scale)``."""
    support = C.positive

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        self._batch_shape = self._broadcast_batch_shape(loc, scale)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return jnp.exp(_f(self.loc) + _f(self.scale) * eps)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        value = _f(value)
        logx = jnp.log(value)
        z = (logx - _f(self.loc)) / _f(self.scale)
        return -0.5 * z * z - jnp.log(_f(self.scale)) - _LOG_SQRT_2PI - logx

    @property
    def mean(self):
        """Mean ``exp(loc + scale**2 / 2)``."""
        return jnp.exp(_f(self.loc) + 0.5 * _f(self.scale) ** 2)


class HalfNormal(Distribution):
    """``Normal(0, scale)`` folded onto the nonnegative half-line."""
    support = C.positive

    def __init__(self, scale=1.0):
        self.scale = scale
        self._batch_shape = self._broadcast_batch_shape(scale)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(jax.random.normal(key, shape, dtype=jnp.result_type(float))) * _f(
            self.scale
        )

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        z = _f(value) / _f(self.scale)
        return math.log(2.0) - 0.5 * z * z - jnp.log(_f(self.scale)) - _LOG_SQRT_2PI

    @property
    def mean(self):
        """Mean of the distribution."""
        return _f(self.scale) * math.sqrt(2.0 / math.pi)


class Cauchy(Distribution):
    """Cauchy with location ``loc`` and scale ``scale``."""
    support = C.real

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        self._batch_shape = self._broadcast_batch_shape(loc, scale)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return _f(self.loc) + _f(self.scale) * jax.random.cauchy(
            key, shape, dtype=jnp.result_type(float)
        )

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        z = (_f(value) - _f(self.loc)) / _f(self.scale)
        return -math.log(math.pi) - jnp.log(_f(self.scale)) - jnp.log1p(z * z)

    @property
    def mean(self):
        # undefined; return loc as the natural center for init heuristics.
        """Mean of the distribution."""
        return jnp.broadcast_to(_f(self.loc), self.batch_shape)


class HalfCauchy(Distribution):
    """``Cauchy(0, scale)`` folded onto the nonnegative half-line."""
    support = C.positive

    def __init__(self, scale=1.0):
        self.scale = scale
        self._batch_shape = self._broadcast_batch_shape(scale)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(jax.random.cauchy(key, shape, dtype=jnp.result_type(float))) * _f(
            self.scale
        )

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        z = _f(value) / _f(self.scale)
        return (
            math.log(2.0 / math.pi) - jnp.log(_f(self.scale)) - jnp.log1p(z * z)
        )

    @property
    def mean(self):
        """Mean of the distribution."""
        return jnp.broadcast_to(_f(self.scale), self.batch_shape)


class StudentT(Distribution):
    """Student's t with ``df`` degrees of freedom, location and scale."""
    support = C.real

    def __init__(self, df, loc=0.0, scale=1.0):
        self.df, self.loc, self.scale = df, loc, scale
        self._batch_shape = self._broadcast_batch_shape(df, loc, scale)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        t = jax.random.t(key, _f(self.df), shape, dtype=jnp.result_type(float))
        return _f(self.loc) + _f(self.scale) * t

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        df = _f(self.df)
        z = (_f(value) - _f(self.loc)) / _f(self.scale)
        return (
            jsp.gammaln((df + 1.0) / 2.0)
            - jsp.gammaln(df / 2.0)
            - 0.5 * jnp.log(df * math.pi)
            - jnp.log(_f(self.scale))
            - (df + 1.0) / 2.0 * jnp.log1p(z * z / df)
        )

    @property
    def mean(self):
        """Mean of the distribution."""
        return jnp.broadcast_to(_f(self.loc), self.batch_shape)


class Uniform(Distribution):
    """Uniform on ``[low, high)``."""
    def __init__(self, low=0.0, high=1.0):
        self.low, self.high = low, high
        self._batch_shape = self._broadcast_batch_shape(low, high)
        self.support = C.Interval(low, high)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(float))
        return _f(self.low) + (_f(self.high) - _f(self.low)) * u

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        value = _f(value)
        lp = -jnp.log(_f(self.high) - _f(self.low))
        inside = (value >= _f(self.low)) & (value <= _f(self.high))
        return jnp.where(inside, lp, -jnp.inf)

    @property
    def mean(self):
        """Mean of the distribution."""
        return 0.5 * (_f(self.low) + _f(self.high))


class Exponential(Distribution):
    """Exponential with ``rate`` (mean ``1/rate``)."""
    support = C.positive

    def __init__(self, rate=1.0):
        self.rate = rate
        self._batch_shape = self._broadcast_batch_shape(rate)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.exponential(key, shape, dtype=jnp.result_type(float)) / _f(
            self.rate
        )

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        return jnp.log(_f(self.rate)) - _f(self.rate) * _f(value)

    @property
    def mean(self):
        """Mean of the distribution."""
        return 1.0 / _f(self.rate)


class Gamma(Distribution):
    """Gamma with shape ``concentration`` and ``rate``."""
    support = C.positive

    def __init__(self, concentration, rate=1.0):
        self.concentration, self.rate = concentration, rate
        self._batch_shape = self._broadcast_batch_shape(concentration, rate)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        g = jax.random.gamma(
            key,
            jnp.broadcast_to(_f(self.concentration), shape),
            dtype=jnp.result_type(float),
        )
        return g / _f(self.rate)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        a, b, x = _f(self.concentration), _f(self.rate), _f(value)
        return a * jnp.log(b) + (a - 1.0) * jnp.log(x) - b * x - jsp.gammaln(a)

    @property
    def mean(self):
        """Mean of the distribution."""
        return _f(self.concentration) / _f(self.rate)


class Beta(Distribution):
    """Beta on ``(0, 1)`` with shapes ``concentration1``, ``concentration0``.
    """
    support = C.unit_interval

    def __init__(self, concentration1, concentration0):
        self.concentration1 = concentration1
        self.concentration0 = concentration0
        self._batch_shape = self._broadcast_batch_shape(concentration1, concentration0)

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.beta(
            key,
            jnp.broadcast_to(_f(self.concentration1), shape),
            jnp.broadcast_to(_f(self.concentration0), shape),
            dtype=jnp.result_type(float),
        )

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        a, b, x = _f(self.concentration1), _f(self.concentration0), _f(value)
        return (
            (a - 1.0) * jnp.log(x)
            + (b - 1.0) * jnp.log1p(-x)
            - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))
        )

    @property
    def mean(self):
        """Mean of the distribution."""
        a, b = _f(self.concentration1), _f(self.concentration0)
        return a / (a + b)


class TruncatedNormal(Distribution):
    """Normal(loc, scale) truncated to [low, high] (either side optional).

    Matches the prior family used by the reference's flagship inference
    example (examples/sir_infer_parameters.py:53-57:
    ``dist.TruncatedNormal(loc=8, scale=2, low=2, high=15)``).
    """

    def __init__(self, loc=0.0, scale=1.0, low=None, high=None):
        self.loc, self.scale = loc, scale
        self.low, self.high = low, high
        self._batch_shape = self._broadcast_batch_shape(loc, scale)
        if low is not None and high is not None:
            self.support = C.Interval(low, high)
        elif low is not None:
            self.support = C.GreaterThan(low)
        elif high is not None:
            self.support = C.LessThan(high)
        else:
            self.support = C.real

    def _std_bounds(self):
        loc, scale = _f(self.loc), _f(self.scale)
        a = (-jnp.inf if self.low is None else (_f(self.low) - loc) / scale)
        b = (jnp.inf if self.high is None else (_f(self.high) - loc) / scale)
        return a, b

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape
        a, b = self._std_bounds()
        z = jax.random.truncated_normal(
            key,
            jnp.broadcast_to(a, shape),
            jnp.broadcast_to(b, shape),
            shape,
            dtype=jnp.result_type(float),
        )
        return _f(self.loc) + _f(self.scale) * z

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        a, b = self._std_bounds()
        z = (_f(value) - _f(self.loc)) / _f(self.scale)
        base = -0.5 * z * z - jnp.log(_f(self.scale)) - _LOG_SQRT_2PI
        log_z = _log_diff_ndtr(a, b)
        inside = (z >= a) & (z <= b)
        return jnp.where(inside, base - log_z, -jnp.inf)

    @property
    def mean(self):
        """Mean of the distribution."""
        a, b = self._std_bounds()
        phi_a = jnp.where(jnp.isfinite(a), jnp.exp(-0.5 * a * a), 0.0) / math.sqrt(
            2 * math.pi
        )
        phi_b = jnp.where(jnp.isfinite(b), jnp.exp(-0.5 * b * b), 0.0) / math.sqrt(
            2 * math.pi
        )
        zden = jsp.ndtr(b) - jsp.ndtr(a)
        return _f(self.loc) + _f(self.scale) * (phi_a - phi_b) / zden


class Dirichlet(Distribution):
    """Dirichlet over the probability simplex (event shape (K,))."""

    support = C.simplex

    def __init__(self, concentration):
        self.concentration = jnp.asarray(concentration, dtype=jnp.result_type(float))
        self._event_shape = self.concentration.shape[-1:]
        self._batch_shape = self.concentration.shape[:-1]

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape))
        return g / jnp.sum(g, axis=-1, keepdims=True)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        a = self.concentration
        x = _f(value)
        return (
            jnp.sum((a - 1.0) * jnp.log(x), axis=-1)
            + jsp.gammaln(jnp.sum(a, axis=-1))
            - jnp.sum(jsp.gammaln(a), axis=-1)
        )

    @property
    def mean(self):
        """Mean of the distribution."""
        return self.concentration / jnp.sum(
            self.concentration, axis=-1, keepdims=True
        )


class MultivariateNormal(Distribution):
    """MVN parameterized by loc and lower-cholesky ``scale_tril``."""

    support = C.real

    def __init__(self, loc, scale_tril):
        self.loc = jnp.asarray(loc)
        self.scale_tril = jnp.asarray(scale_tril)
        self._event_shape = (self.loc.shape[-1],)
        self._batch_shape = jnp.broadcast_shapes(
            self.loc.shape[:-1], self.scale_tril.shape[:-2]
        )

    def sample(self, key, sample_shape=()):
        """Draw samples with ``key``; shape ``sample_shape + shape()``."""
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, value):
        """Elementwise log-density of ``value``."""
        diff = _f(value) - self.loc
        # solve L z = diff
        z = jax.scipy.linalg.solve_triangular(self.scale_tril, diff[..., None], lower=True)[
            ..., 0
        ]
        d = self.loc.shape[-1]
        half_logdet = jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1))), axis=-1
        )
        return -0.5 * jnp.sum(z * z, axis=-1) - half_logdet - d * _LOG_SQRT_2PI

    @property
    def mean(self):
        """Mean of the distribution."""
        return self.loc


__all__ = [
    "Normal",
    "LogNormal",
    "HalfNormal",
    "Cauchy",
    "HalfCauchy",
    "StudentT",
    "Uniform",
    "Exponential",
    "Gamma",
    "Beta",
    "TruncatedNormal",
    "MultivariateNormal",
    "Dirichlet",
]
