"""Stiff SEIRS: a fast immune-boosting/waning sub-process.

When one biological timescale is orders of magnitude faster than the
epidemic (here: a rapid post-recovery boosting compartment decaying at
rate 50/day into long-term immunity, against multi-week transmission
dynamics), an explicit solver's STABILITY limit -- not accuracy -- pins
its step size: Tsit5 must hold dt under ~0.05 days for 100 days even
though nothing interesting happens at that resolution. The L-stable
TRBDF2 ESDIRK scheme (docs/simulation.md, ode/implicit.py) steps at the
epidemic's own timescale and reaches the same answer with far fewer
steps.

This runs both solvers, checks they agree, and prints the step counts --
the stiff capability the reference exposes through diffrax's implicit
solvers (SolverParams.solver_method accepts any solver;
/root/reference/src/dynode/config/params.py:28-35).
"""

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import matplotlib

matplotlib.use("Agg")
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.ode import TRBDF2
from dynode_tpu.struct import pytree_dataclass

FAST = _bootstrap.fast_mode()
DAYS = 40 if FAST else 100


@pytree_dataclass
class StiffSEIRSParams:
    beta: jnp.ndarray
    sigma: jnp.ndarray  # E -> I
    gamma: jnp.ndarray  # I -> B (fast boosting compartment)
    kappa: jnp.ndarray  # B -> R, FAST (the stiff rate)
    omega: jnp.ndarray  # R -> S waning


def stiff_seirs_ode(t, state, p: StiffSEIRSParams):
    s, e, i, b, r = state
    n = s + e + i + b + r
    foi = p.beta * i / n
    return (
        -foi * s + p.omega * r,
        foi * s - p.sigma * e,
        p.sigma * e - p.gamma * i,
        p.gamma * i - p.kappa * b,  # kappa >> everything else
        p.kappa * b - p.omega * r,
    )


if __name__ == "__main__":
    p = StiffSEIRSParams(
        beta=jnp.asarray(0.3),
        sigma=jnp.asarray(1 / 3.6),
        gamma=jnp.asarray(1 / 7.0),
        kappa=jnp.asarray(50.0),  # boosting decays in ~30 minutes
        omega=jnp.asarray(1 / 90.0),
    )
    y0 = tuple(
        jnp.asarray(v) for v in (9_990.0, 0.0, 10.0, 0.0, 0.0)
    )

    stiff_sp = SolverParams(
        solver_method=TRBDF2(),
        ode_solver_rel_tolerance=1e-6,
        ode_solver_abs_tolerance=1e-4,  # states are O(1e4)
        step_budget=512,
    )
    explicit_sp = SolverParams(
        ode_solver_rel_tolerance=1e-6,
        ode_solver_abs_tolerance=1e-4,
        step_budget=8192,  # Tsit5 needs dt <~ 0.05d just for stability
    )

    sol_i = simulate(stiff_seirs_ode, DAYS, y0, p, stiff_sp)
    sol_e = simulate(stiff_seirs_ode, DAYS, y0, p, explicit_sp)
    assert int(sol_i.result) == 0 and int(sol_e.result) == 0
    for a, b_ in zip(sol_i.ys, sol_e.ys):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-3, atol=1.0
        )
    n_i = int(sol_i.stats["num_steps"])
    n_e = int(sol_e.stats["num_steps"])
    print(
        f"TRBDF2 (implicit): {n_i} steps; Tsit5 (explicit, "
        f"stability-limited): {n_e} steps -> {n_e / n_i:.0f}x fewer "
        "steps for the same trajectory"
    )
    assert n_i < n_e / 4, (n_i, n_e)

    t = np.asarray(sol_i.ts)
    fig, ax = plt.subplots(figsize=(7, 4))
    for name, series in zip("SEIBR", sol_i.ys):
        ax.plot(t, np.asarray(series), label=name)
    ax.set_xlabel("day")
    ax.set_ylabel("population")
    ax.set_title(f"stiff SEIRS (kappa=50/day) via TRBDF2, {n_i} steps")
    ax.legend()
    fig.tight_layout()
    fig.savefig("seirs_stiff_waning.png", dpi=120)
    print("saved seirs_stiff_waning.png")
