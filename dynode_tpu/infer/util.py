"""Model introspection: traces -> transforms -> potential functions.

The glue between user models (plain callables with sample sites) and the
gradient-based samplers: discovers latent sites, maps them to unconstrained
space via ``dist.transforms.biject_to``, and builds the flat potential
``U(z) = -[log p(constrain(z)) + log|det J|]`` that NUTS/SVI differentiate.
"""

from typing import Any, Callable, Dict, Optional, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..config import PlaceholderSample
from ..dist import Distribution
from ..dist.transforms import biject_to
from . import handlers


def get_model_trace(model, rng_key, *args, substitutions=None, **kwargs):
    """Run ``model`` once under seed (+ optional substitute) and record sites.

    Wrapped in ``handlers.block`` so this internal trace never leaks sites
    into a surrounding user trace.
    """
    sub = handlers.substitute(substitutions or {})
    with handlers.block(), handlers.trace() as tr, handlers.seed(rng_key), sub:
        model(*args, **kwargs)
    return tr


def latent_sites(tr) -> Dict[str, Dict[str, Any]]:
    """Sample sites that are unobserved, real latents (not placeholders).

    Point-mass (``Delta``) sites are excluded: a reparameterized site
    (handlers.reparam) is a Delta at a value recomputed from its
    auxiliary latent, and a literal Delta latent is a constant -- neither
    has anything for a sampler or guide to do.
    """
    from ..dist.distribution import Delta

    return {
        name: site
        for name, site in tr.items()
        if site["type"] == "sample"
        and not site["is_observed"]
        and isinstance(site["fn"], Distribution)
        and not isinstance(site["fn"], (PlaceholderSample, Delta))
    }


def get_transforms(tr) -> Dict[str, Any]:
    """Per-latent-site bijection from unconstrained space onto its support."""
    return {name: biject_to(site["fn"].support) for name, site in latent_sites(tr).items()}


def log_density(
    model,
    model_args: tuple,
    model_kwargs: dict,
    params: Dict[str, Any],
    centers: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Joint log density of the model at the given (constrained) latents.

    Returns (log_joint, trace). Sites absent from ``params`` are sampled
    fresh (deterministically seeded) -- well-formed inference passes values
    for every latent.

    ``centers`` maps site names to constant per-element reference log-probs
    that are subtracted *before* the sum. With many observations the raw
    log-likelihood total is O(1e5) while HMC energy differences are O(1);
    in float32 that cancellation costs ~1 unit of energy noise. Centering
    each term at a fixed reference keeps the summands (and the sum) O(1),
    shifting the density by a constant -- which leaves the posterior and
    every accept ratio mathematically unchanged.
    """
    with handlers.block(), handlers.trace() as tr, handlers.seed(
        jax.random.PRNGKey(0)
    ), handlers.substitute(params):
        model(*model_args, **model_kwargs)
    log_joint = jnp.zeros((), dtype=jnp.result_type(float))
    for name, site in tr.items():
        if site["type"] == "sample" and isinstance(site["fn"], Distribution):
            lp = handlers.weighted_log_prob(
                site,
                center=centers.get(name) if centers is not None else None,
            )
            log_joint = log_joint + jnp.sum(lp)
    return log_joint, tr


def observed_logprob_centers(tr) -> Dict[str, jax.Array]:
    """Per-element log-probs of every observed site in a model trace.

    Evaluated once at the trace's parameter values and reused as the fixed
    centering constants for :func:`log_density` (see ``centers``).
    """
    centers = {}
    for name, site in tr.items():
        if (
            site["type"] == "sample"
            and site["is_observed"]
            and isinstance(site["fn"], Distribution)
        ):
            centers[name] = jax.lax.stop_gradient(
                site["fn"].log_prob(site["value"])
            )
    return centers


def constrain_sample(transforms: Dict[str, Any], uparams: Dict[str, Any]):
    """Map an unconstrained latent dict onto the supports."""
    return {name: transforms[name](u) for name, u in uparams.items()}


def unconstrain_sample(transforms: Dict[str, Any], cparams: Dict[str, Any]):
    """Inverse of :func:`constrain_sample`."""
    return {name: transforms[name].inv(c) for name, c in cparams.items()}


def make_potential_fn(
    model,
    model_args: tuple,
    model_kwargs: dict,
    transforms: Dict[str, Any],
    centers: Optional[Dict[str, jax.Array]] = None,
) -> Callable[[Dict[str, Any]], jax.Array]:
    """Potential over the *unconstrained* latent dict (negative log joint + ldj).

    ``centers`` (see :func:`log_density`) shifts the potential by a constant
    to keep float32 energy differences cancellation-free.
    """

    def potential(uparams: Dict[str, Any]) -> jax.Array:
        cparams = {}
        ldj = jnp.zeros((), dtype=jnp.result_type(float))
        for name, u in uparams.items():
            t = transforms[name]
            c = t(u)
            cparams[name] = c
            ldj = ldj + jnp.sum(t.log_abs_det_jacobian(u, c))
        log_joint, _ = log_density(
            model, model_args, model_kwargs, cparams, centers=centers
        )
        return -(log_joint + ldj)

    return potential


def flatten_potential(
    potential_fn: Callable[[Dict[str, Any]], jax.Array],
    example_uparams: Dict[str, Any],
):
    """Vectorize the potential: dict latents -> flat R^D (for mass matrices)."""
    flat0, unravel = ravel_pytree(example_uparams)

    def flat_potential(zvec):
        return potential_fn(unravel(zvec))

    return flat_potential, flat0, unravel


# ---------------------------------------------------------------------------
# init strategies (API parity with numpyro's init_to_* used by the reference:
# src/dynode/infer/inference.py:15 imports init_to_median)
# ---------------------------------------------------------------------------


def init_to_median(site: Dict[str, Any], rng_key, num_samples: int = 15):
    """Init a latent to the elementwise median of ``num_samples`` prior draws."""
    draws = site["fn"].sample(rng_key, (num_samples,))
    return jnp.median(jnp.asarray(draws), axis=0)


def init_to_sample(site: Dict[str, Any], rng_key):
    """Init a latent to a single prior draw."""
    return site["fn"].sample(rng_key)


def init_to_mean(site: Dict[str, Any], rng_key):
    """Init a latent to its prior mean (falls back to a prior draw)."""
    try:
        mean = site["fn"].mean
        if mean is not None and bool(jnp.all(jnp.isfinite(jnp.asarray(mean)))):
            return jnp.broadcast_to(mean, jnp.shape(site["value"]))
    except (NotImplementedError, TypeError):
        pass
    return init_to_sample(site, rng_key)


def init_to_uniform(site: Dict[str, Any], rng_key, radius: float = 2.0):
    """Init uniformly in [-radius, radius] in *unconstrained* space."""
    t = biject_to(site["fn"].support)
    # draw in the UNCONSTRAINED shape (differs from the constrained one for
    # e.g. simplex supports: StickBreaking maps R^K -> (K+1)-simplex), else
    # the init value has the wrong trailing dimension (ADVICE r1).
    shape = jnp.shape(t.inv(site["value"]))
    u = jax.random.uniform(rng_key, shape, minval=-radius, maxval=radius)
    return t(u)


def init_to_value(values: Dict[str, Any], fallback: Callable = init_to_median):
    """Strategy factory: init named latents to given (constrained) values.

    Sites absent from ``values`` fall back to ``fallback`` (numpyro's
    init_to_value semantics). Pass the result as ``init_strategy=``.
    """

    def init(site: Dict[str, Any], rng_key):
        name = site.get("name")
        if name in values:
            return jnp.asarray(values[name])
        return fallback(site, rng_key)

    return init


def initialize_latents(
    tr,
    rng_key,
    init_strategy: Callable = init_to_median,
) -> Dict[str, Any]:
    """Constrained init values for every latent site of a traced model."""
    out = {}
    for name, site in latent_sites(tr).items():
        rng_key, sub = jax.random.split(rng_key)
        out[name] = jnp.asarray(init_strategy(site, sub))
    return out


__all__ = [
    "get_model_trace",
    "latent_sites",
    "get_transforms",
    "log_density",
    "constrain_sample",
    "unconstrain_sample",
    "make_potential_fn",
    "flatten_potential",
    "init_to_median",
    "init_to_sample",
    "init_to_mean",
    "init_to_uniform",
    "init_to_value",
    "initialize_latents",
]
