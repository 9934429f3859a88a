"""Step-size controllers: constant, PID (I-controller default), jump clipping.

Matches the controller configuration the reference requests from diffrax
(reference: src/dynode/simulation/odes.py:114-131): ``ConstantStepSize`` when
``constant_step_size > 0`` else ``ClipStepSizeController(PIDController(rtol,
atol), jump_ts=discontinuity_points)``. diffrax's ``PIDController`` defaults
to pcoeff=0, icoeff=1, dcoeff=0 -- a plain I-controller -- which is what we
implement, with the same safety/factor clamps.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def rms_error_norm(err, y0, y1, rtol, atol):
    """Scaled RMS norm of the local error estimate over the whole state pytree."""
    sq_sum = 0.0
    count = 0
    for e_leaf, y0_leaf, y1_leaf in zip(
        jax.tree_util.tree_leaves(err),
        jax.tree_util.tree_leaves(y0),
        jax.tree_util.tree_leaves(y1),
    ):
        scale = atol + rtol * jnp.maximum(jnp.abs(y0_leaf), jnp.abs(y1_leaf))
        r = e_leaf / scale
        sq_sum = sq_sum + jnp.sum(r * r)
        count += e_leaf.size
    return jnp.sqrt(sq_sum / count)


class AbstractStepSizeController:
    """Interface: propose the next dt and an accept decision for each step."""

    adaptive: bool = False
    #: sorted discontinuity times the integrator must land on exactly
    jump_ts: Optional[jnp.ndarray] = None

    def init_dt(self, term, solver, t0, t1, y0, f0, args, dt0):
        """Choose the initial step size for a solve."""
        raise NotImplementedError

    def adapt(self, err_norm, dt, solver):
        """Return (accept, factor) given the scaled error norm of a trial step."""
        raise NotImplementedError


class ConstantStepSize(AbstractStepSizeController):
    """Fixed dt; every step accepted."""

    adaptive = False

    def init_dt(self, term, solver, t0, t1, y0, f0, args, dt0):
        """The configured constant ``dt``."""
        if dt0 is None:
            raise ValueError("ConstantStepSize requires an explicit dt0")
        return jnp.asarray(dt0, dtype=jnp.result_type(float))

    def adapt(self, err_norm, dt, solver):
        """Always accept; ``dt`` never changes."""
        return jnp.asarray(True), jnp.asarray(1.0, dtype=jnp.result_type(float))

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(self) is type(other)


class PIDController(AbstractStepSizeController):
    """Adaptive controller; defaults reproduce diffrax's I-control behavior.

    ``factor = clip(safety * err_norm**(-1/err_order), factormin, factormax)``
    with the optional proportional term ``err_prev**(-pcoeff/err_order)`` when
    ``pcoeff > 0`` (not used by the reference's defaults).
    """

    adaptive = True

    def __init__(
        self,
        rtol: float,
        atol: float,
        *,
        safety: float = 0.9,
        factormin: float = 0.2,
        factormax: float = 10.0,
        dtmin: Optional[float] = None,
        dtmax: Optional[float] = None,
    ):
        self.rtol = rtol
        self.atol = atol
        self.safety = safety
        self.factormin = factormin
        self.factormax = factormax
        self.dtmin = dtmin
        self.dtmax = dtmax

    def init_dt(self, term, solver, t0, t1, y0, f0, args, dt0):
        """Hairer-style automatic initial ``dt`` (or the user-provided ``dt0``).
        """
        if dt0 is not None:
            return jnp.asarray(dt0, dtype=jnp.result_type(float))
        return select_initial_step(
            term, t0, y0, f0, args, solver.err_order, self.rtol, self.atol
        )

    def adapt(self, err_norm, dt, solver):
        # guard err_norm == 0 (e.g. exact solutions / masked steps)
        """Accept/reject and propose the next ``dt`` from the scaled error norm.
        """
        safe_norm = jnp.maximum(err_norm, jnp.finfo(jnp.result_type(float)).tiny)
        exponent = 1.0 / solver.err_order
        factor = jnp.clip(
            self.safety * safe_norm**-exponent, self.factormin, self.factormax
        )
        accept = err_norm <= 1.0
        return accept, factor

    def clamp_dt(self, dt):
        """Clamp ``dt`` into the configured ``[dtmin, dtmax]``."""
        if self.dtmin is not None:
            dt = jnp.maximum(dt, self.dtmin)
        if self.dtmax is not None:
            dt = jnp.minimum(dt, self.dtmax)
        return dt

    def _config(self):
        return (
            self.rtol,
            self.atol,
            self.safety,
            self.factormin,
            self.factormax,
            self.dtmin,
            self.dtmax,
        )

    def __hash__(self):
        return hash((type(self), self._config()))

    def __eq__(self, other):
        return type(self) is type(other) and self._config() == other._config()


class ClipStepSizeController(AbstractStepSizeController):
    """Wrap another controller, clipping steps to land exactly on ``jump_ts``.

    Discontinuity times come from ``SolverParams.discontinuity_points``
    (reference: src/dynode/config/params.py:56-62). Landing exactly on each
    jump keeps the RK stages from straddling a gradient discontinuity, which
    would otherwise poison the local error estimate.
    """

    def __init__(self, controller: AbstractStepSizeController, jump_ts=None):
        self.controller = controller
        if jump_ts is not None:
            # stored as a sorted tuple so the controller stays hashable (it
            # is a static argument of the integrator's jit cache); the
            # integrator materializes the jnp grid at trace time.
            import numpy as _np

            self.jump_ts = tuple(sorted(float(t) for t in _np.asarray(jump_ts).ravel()))
        else:
            self.jump_ts = None

    @property
    def adaptive(self):
        """Whether the wrapped controller adapts ``dt``."""
        return self.controller.adaptive

    def init_dt(self, term, solver, t0, t1, y0, f0, args, dt0):
        """Delegate to the wrapped controller."""
        return self.controller.init_dt(term, solver, t0, t1, y0, f0, args, dt0)

    def adapt(self, err_norm, dt, solver):
        """Delegate to the wrapped controller (clipping happens in the engine).
        """
        return self.controller.adapt(err_norm, dt, solver)

    def clamp_dt(self, dt):
        """Delegate to the wrapped controller's clamp when it has one."""
        clamp = getattr(self.controller, "clamp_dt", None)
        return clamp(dt) if clamp is not None else dt

    def __hash__(self):
        return hash((type(self), self.controller, self.jump_ts))

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.controller == other.controller
            and self.jump_ts == other.jump_ts
        )


def select_initial_step(term, t0, y0, f0, args, err_order, rtol, atol):
    """Hairer/Wanner automatic initial step size (algorithm II.4 of H&W).

    Same scheme diffrax uses when ``dt0=None``
    (reference: src/dynode/simulation/odes.py:109 passes dt0=None).
    """

    def scaled_norm(tree, ref):
        sq, n = 0.0, 0
        for leaf, ref_leaf in zip(
            jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(ref)
        ):
            scale = atol + rtol * jnp.abs(ref_leaf)
            r = leaf / scale
            sq = sq + jnp.sum(r * r)
            n += leaf.size
        return jnp.sqrt(sq / n)

    d0 = scaled_norm(y0, y0)
    d1 = scaled_norm(f0, y0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)

    y1 = jax.tree_util.tree_map(lambda y, f: y + h0 * f, y0, f0)
    f1 = term.vf(t0 + h0, y1, args)
    diff = jax.tree_util.tree_map(lambda a, b: a - b, f1, f0)
    d2 = scaled_norm(diff, y0) / h0

    h1 = jnp.where(
        jnp.maximum(d1, d2) <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / err_order),
    )
    return jnp.minimum(100.0 * h0, h1)


__all__ = [
    "AbstractStepSizeController",
    "ConstantStepSize",
    "PIDController",
    "ClipStepSizeController",
    "select_initial_step",
    "rms_error_norm",
]
