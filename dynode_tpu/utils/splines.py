"""Cubic-spline evaluation for time-varying vaccination uptake.

Same math as the reference (src/dynode/utils/splines.py:10-109): a cubic base
polynomial plus truncated-cubic knot terms, evaluated for every (age bin x
vaccination count) combination at simulation day t. All ops are elementwise
jnp -- inside a jitted RHS they fuse into the surrounding step program.
"""

import jax.numpy as jnp
from jax import Array
from jax.typing import ArrayLike


def base_equation(t: ArrayLike, coefficients: Array) -> Array:
    """a + b*t + c*t^2 + d*t^3 for each (age, dose) coefficient row.

    ``coefficients``: (NUM_AGE, MAX_VAX+1, 4) -> returns (NUM_AGE, MAX_VAX+1).
    """
    t = jnp.asarray(t)
    powers = jnp.stack(
        [jnp.ones_like(t), t, t**2, t**3], axis=-1
    )  # (..., 4)
    return jnp.sum(coefficients * powers[..., None, None, :], axis=-1)


def conditional_knots(t: ArrayLike, knots: Array, coefficients: Array) -> Array:
    """sum_i coeffs[i] * (t - knots[i])^3 * I(t > knots[i]) over the knot axis."""
    t = jnp.asarray(t)
    active = jnp.where(t[..., None, None, None] > knots, t[..., None, None, None] - knots, 0.0)
    return jnp.sum(active**3 * coefficients, axis=-1)


def evaluate_cubic_spline(
    t,
    knot_locations: Array,
    base_equations: Array,
    knot_coefficients: Array,
) -> Array:
    """Evaluate the full vaccination-uptake spline at day ``t``.

    ``f(t) = a + bt + ct^2 + dt^3 + sum_i coeffs[i] (t-knot_i)^3 I(t>knot_i)``
    for every age x dose combination.

    Shapes: knot_locations/knot_coefficients (NUM_AGE, MAX_VAX+1, K),
    base_equations (NUM_AGE, MAX_VAX+1, 4) -> (NUM_AGE, MAX_VAX+1).
    """
    return base_equation(t, base_equations) + conditional_knots(
        t, knot_locations, knot_coefficients
    )


__all__ = ["base_equation", "conditional_knots", "evaluate_cubic_spline"]
