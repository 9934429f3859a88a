"""SaveAt / SubSaveAt: which times and which compartments to materialize.

Semantics follow the reference's usage (src/dynode/simulation/odes.py:148-198):
``SaveAt(ts=...)`` saves the full state on a time grid; ``SaveAt(subs=
SubSaveAt(ts=..., fn=...))`` applies ``fn(t, y, args)`` to each saved state,
letting callers replace unsaved compartments with empty ``(T, 0)`` arrays.
"""

from typing import Callable, Optional


class SubSaveAt:
    """A save grid plus a postprocessing fn applied to each saved state."""

    def __init__(self, ts, fn: Optional[Callable] = None):
        self.ts = ts
        self.fn = fn if fn is not None else (lambda t, y, args: y)


class SaveAt:
    """Container selecting save times (and optionally a SubSaveAt transform)."""

    def __init__(self, ts=None, subs: Optional[SubSaveAt] = None, t1: bool = False):
        if ts is None and subs is None and not t1:
            raise ValueError("SaveAt requires ts=, subs=, or t1=True")
        self.ts = ts
        self.subs = subs
        self.t1 = t1


__all__ = ["SaveAt", "SubSaveAt"]
