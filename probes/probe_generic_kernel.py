"""Does the generic rows-RHS whole-solve kernel match the hand kernel?

Runs the multistrain workload through BOTH the specialized
`ensemble_solve_tsit5` and the generic `ensemble_solve_kernel` (with
multistrain's `_rhs_rows` supplied as a user RHS) at bench widths, checking
numerical equivalence and throughput parity on the real chip. Also runs the
3-row SIR RHS -- a state too small to ever justify a hand kernel -- to show
the generic engine gives tiny models the same VMEM-resident path.

Usage: python probes/probe_generic_kernel.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import dynode_tpu.ops.multistrain_pallas as mp  # noqa: E402
from dynode_tpu.config import SolverParams  # noqa: E402
from dynode_tpu.models.multistrain import (  # noqa: E402
    multistrain_config,
    multistrain_initial_state,
    multistrain_odeparams,
)
from dynode_tpu.ops import ensemble_solve_kernel, ensemble_solve_tsit5  # noqa: E402

A, K = mp.A_DIM, mp.K_DIM
DUR, DT = 200.0, 0.5


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    cfg = multistrain_config(solver_params=SolverParams(constant_step_size=DT))
    par = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    contact = tuple(
        tuple(float(v) for v in row) for row in np.asarray(par.contact_matrix)
    )

    def rhs(y, p, t):
        return mp._rhs_rows(
            y, contact, p[:K], p[K:2 * K], p[2 * K:3 * K], p[3 * K:4 * K], A, K
        )

    def inputs(B, seed):
        scales = jax.random.uniform(
            jax.random.PRNGKey(seed), (B,), minval=0.8, maxval=1.25
        )
        beta = par.beta[None, :] * scales[:, None]
        yp = mp.pack_state(y0, B)
        pp = mp.pack_params(beta, par.sigma, par.gamma, par.omega, B)
        return yp, pp, beta

    # equivalence at modest width
    yp, pp, beta = inputs(2048, 0)
    got = ensemble_solve_kernel(rhs, yp, pp, duration=DUR, dt=DT)
    want = ensemble_solve_tsit5(
        y0, beta, par.sigma, par.gamma, par.omega, par.contact_matrix,
        batch=2048, duration=DUR, dt=DT,
    )
    rel = float(jnp.max(jnp.abs(got - want) / jnp.maximum(jnp.abs(want), 1e-6)))
    print(f"generic-vs-specialized max rel err (B=2048): {rel:.2e}")

    # throughput parity at bench widths
    for B in (79872, 163840):
        yp, pp, beta = inputs(B, B)
        for name, run in (
            ("generic", lambda s, yp=yp, pp=pp: ensemble_solve_kernel(
                rhs, yp, pp, duration=DUR, dt=DT)),
            ("special", lambda s, beta=beta, B=B: ensemble_solve_tsit5(
                y0, beta, par.sigma, par.gamma, par.omega, par.contact_matrix,
                batch=B, duration=DUR, dt=DT)),
        ):
            out = run(0)
            float(jnp.sum(out[-1]))  # compile + sync
            walls = []
            for rep in (1, 2, 3):
                t0 = time.perf_counter()
                out = run(rep)
                float(jnp.sum(out[-1]))
                walls.append(time.perf_counter() - t0)
            w = sorted(walls)[1]
            print(f"B={B} {name}: {B / w:,.0f} traj/s ({w:.3f}s)")

    # tiny-state model: SIR through the generic engine at width
    def sir_rhs(y, p, t):
        s, i, r = y
        inf = p[0] * s * i
        rec = p[1] * i
        return [-inf, inf - rec, rec]

    B = 163840
    key = jax.random.PRNGKey(3)
    p_sir = jnp.stack([
        jax.random.uniform(key, (B,), minval=0.2, maxval=0.5),
        jnp.full((B,), 0.1),
    ])
    y_sir = jnp.stack([
        jnp.full((B,), 0.99), jnp.full((B,), 0.01), jnp.zeros(B)
    ])
    out = ensemble_solve_kernel(sir_rhs, y_sir, p_sir, duration=DUR, dt=DT)
    float(jnp.sum(out[-1]))
    walls = []
    for rep in (1, 2, 3):
        t0 = time.perf_counter()
        out = ensemble_solve_kernel(sir_rhs, y_sir, p_sir, duration=DUR, dt=DT)
        float(jnp.sum(out[-1]))
        walls.append(time.perf_counter() - t0)
    w = sorted(walls)[1]
    print(f"B={B} SIR generic kernel: {B / w:,.0f} traj/s ({w:.3f}s)")


if __name__ == "__main__":
    main()
