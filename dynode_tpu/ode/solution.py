"""Solution pytree returned by diffeqsolve.

Field contract matches what the reference reads off ``diffrax.Solution``
(reference: src/dynode/simulation/odes.py:72-78 and
tests/test_simulation/test_odes.py:45-74): ``sol.ys`` is a tuple of
``(num_saves, *compartment_shape)`` arrays including t=0 and t=tf, and
``sol.ts`` is the save-time grid.
"""

from typing import Any, Dict

import jax

from ..struct import pytree_dataclass

#: solve reached t1 within the step budget
RESULT_SUCCESS = 0
#: step budget (min(max_steps, step_budget)) exhausted before reaching t1;
#: save times beyond the last reached time are NaN-filled so failures are loud.
RESULT_MAX_STEPS = 1


@pytree_dataclass
class Solution:
    """Result of an ODE solve (a pytree: jit/vmap-transparent)."""

    t0: jax.Array
    t1: jax.Array
    ts: jax.Array
    ys: Any
    stats: Dict[str, jax.Array]
    result: jax.Array

    @property
    def success(self):
        """True when the solve finished within budget (``result == 0``)."""
        return self.result == RESULT_SUCCESS


__all__ = ["Solution", "RESULT_SUCCESS", "RESULT_MAX_STEPS"]
