"""Explicit Runge-Kutta solvers as static Butcher tableaus.

The stage loop is unrolled at trace time (s <= 7 stages), so each step
compiles to a handful of fused VPU ops over the compartment pytree -- no
dynamic control flow on the hot path. Coefficients are the published
Tsitouras-5(4), Dormand-Prince-5(4) and Bogacki-Shampine-3(2) tableaus
(reference default solver: src/dynode/config/params.py:28-35 uses
``diffrax.Tsit5``).
"""

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ODETerm:
    """Wraps a vector field ``f(t, y, args) -> dy/dt`` (pytree-valued).

    Hashable by vector-field identity so solves with the same RHS hit the
    integrator's jit cache.
    """

    def __init__(self, vector_field: Callable):
        self.vector_field = vector_field

    def vf(self, t, y, args):
        """Evaluate the vector field at ``(t, y, args)``."""
        return self.vector_field(t, y, args)

    def __hash__(self):
        return hash(self.vector_field)

    def __eq__(self, other):
        return (
            isinstance(other, ODETerm)
            and self.vector_field is other.vector_field
        )


def _tree_muladd(y0, scaled: Sequence[Tuple[float, Any]]):
    """y0 + sum_i coeff_i * k_i, elementwise over the pytree, skipping zeros."""

    def combine(y_leaf, *k_leaves):
        acc = y_leaf
        for (coeff, _), k_leaf in zip(scaled, k_leaves):
            acc = acc + coeff * k_leaf
        return acc

    ks = [k for _, k in scaled]
    return jax.tree_util.tree_map(combine, y0, *ks)


class AbstractSolver:
    """Base class for explicit RK solvers defined by a Butcher tableau.

    Attributes
    ----------
    c, a, b, e : tableau nodes, stage matrix, solution weights, and error
        weights (e = b - b_hat, so ``err = dt * sum_j e_j k_j``).
    order : order of the advanced solution (for step-size exponents).
    err_order : order used in the step-controller exponent (q + 1).
    fsal : whether the last stage equals f(t1, y1) (reused as next k1).
    """

    c: np.ndarray
    a: Tuple[Tuple[float, ...], ...]
    b: Tuple[float, ...]
    e: Optional[Tuple[float, ...]]
    order: int
    err_order: int
    fsal: bool = False

    @property
    def stages(self) -> int:
        """Number of RK stages (length of ``b``)."""
        return len(self.b)

    # solvers are stateless: hash/eq by class so jit caches across instances
    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(self) is type(other)

    def _stages_and_err(self, term: ODETerm, t, dt, y, args, f0=None):
        ks = []
        if self.fsal and f0 is not None:
            k1 = f0
        else:
            k1 = term.vf(t, y, args)
        ks.append(k1)
        for i in range(1, self.stages):
            coeffs = [
                (dt * aij, ks[j]) for j, aij in enumerate(self.a[i - 1]) if aij != 0.0
            ]
            y_stage = _tree_muladd(y, coeffs) if coeffs else y
            ks.append(term.vf(t + self.c[i] * dt, y_stage, args))
        if self.e is not None:
            err = _tree_muladd(
                jax.tree_util.tree_map(jnp.zeros_like, y),
                [(dt * ej, ks[j]) for j, ej in enumerate(self.e) if ej != 0.0],
            )
        else:
            err = None
        f1 = ks[-1] if self.fsal else None
        return ks, err, f1

    def step(self, term: ODETerm, t, dt, y, args, f0=None):
        """Advance one step: returns (y1, err, f1_for_fsal).

        ``f0`` is the FSAL carry (``f(t, y)``); computed fresh if None.
        ``err`` is None for solvers without an embedded error estimate.
        """
        ks, err, f1 = self._stages_and_err(term, t, dt, y, args, f0)
        y1 = _tree_muladd(
            y, [(dt * bj, ks[j]) for j, bj in enumerate(self.b) if bj != 0.0]
        )
        return y1, err, f1

    def step_inc(self, term: ODETerm, t, dt, y, args, f0=None):
        """Like :meth:`step`, but returns ``(inc, err, f1)`` with the raw
        per-step increment ``inc = dt * sum_j b_j k_j`` (so ``y1 = y + inc``).

        The increment is what compensated (Kahan/TwoSum) accumulation in the
        integrator needs: ``fl(y + inc)`` discards the low bits of ``inc``,
        and recovering them from ``y1 - y`` would re-lose exactly those bits.
        Implicit solvers fall back to the (uncompensatable) difference form.
        """
        ks, err, f1 = self._stages_and_err(term, t, dt, y, args, f0)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, y)
        inc = _tree_muladd(
            zeros, [(dt * bj, ks[j]) for j, bj in enumerate(self.b) if bj != 0.0]
        )
        return inc, err, f1


class Euler(AbstractSolver):
    """Forward Euler (no error estimate; constant-step only)."""

    c = np.array([0.0])
    a = ()
    b = (1.0,)
    e = None
    order = 1
    err_order = 2
    fsal = False


class Heun(AbstractSolver):
    """Heun 2(1) with embedded Euler error estimate."""

    c = np.array([0.0, 1.0])
    a = ((1.0,),)
    b = (0.5, 0.5)
    e = (-0.5, 0.5)
    order = 2
    err_order = 2
    fsal = False


class Bosh3(AbstractSolver):
    """Bogacki-Shampine 3(2), FSAL."""

    c = np.array([0.0, 0.5, 0.75, 1.0])
    a = (
        (0.5,),
        (0.0, 0.75),
        (2 / 9, 1 / 3, 4 / 9),
    )
    b = (2 / 9, 1 / 3, 4 / 9, 0.0)
    _bhat = (7 / 24, 1 / 4, 1 / 3, 1 / 8)
    e = tuple(bi - bh for bi, bh in zip(b, _bhat))
    order = 3
    err_order = 3
    fsal = True


class Tsit5(AbstractSolver):
    """Tsitouras 5(4), FSAL -- the reference's default solver."""

    c = np.array(
        [0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0]
    )
    a = (
        (0.161,),
        (-0.008480655492356989, 0.335480655492357),
        (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
        (
            5.325864828439257,
            -11.748883564062828,
            7.4955393428898365,
            -0.09249506636175525,
        ),
        (
            5.86145544294642,
            -12.92096931784711,
            8.159367898576159,
            -0.071584973281401,
            -0.028269050394068383,
        ),
        (
            0.09646076681806523,
            0.01,
            0.4798896504144996,
            1.379008574103742,
            -3.290069515436081,
            2.324710524099774,
        ),
    )
    b = (
        0.09646076681806523,
        0.01,
        0.4798896504144996,
        1.379008574103742,
        -3.290069515436081,
        2.324710524099774,
        0.0,
    )
    # e = b - bhat (signs such that err = dt * sum e_j k_j)
    e = (
        -0.00178001105222577714,
        -0.0008164344596567469,
        0.007880878010261995,
        -0.1447110071732629,
        0.5823571654525552,
        -0.45808210592918697,
        0.015151515151515152,
    )
    order = 5
    err_order = 5
    fsal = True


class Dopri5(AbstractSolver):
    """Dormand-Prince 5(4), FSAL."""

    c = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
    a = (
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    )
    b = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
    _bhat = (
        5179 / 57600,
        0.0,
        7571 / 16695,
        393 / 640,
        -92097 / 339200,
        187 / 2100,
        1 / 40,
    )
    e = tuple(bi - bh for bi, bh in zip(b, _bhat))
    order = 5
    err_order = 5
    fsal = True


__all__ = [
    "ODETerm",
    "AbstractSolver",
    "Euler",
    "Heun",
    "Bosh3",
    "Tsit5",
    "Dopri5",
]
