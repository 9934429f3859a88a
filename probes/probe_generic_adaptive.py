"""Measure the adaptive generic kernel against its alternatives on TPU.

Rows compared on the 26-row multistrain workload (200 days, daily saves):
  1. generic ADAPTIVE kernel (lockstep BS3(2), rtol=1e-4) -- this round
  2. generic CONSTANT-step kernel (Tsit5, dt=0.5) -- the round-4 baseline
  3. XLA save-grid adaptive engine, lane-major shared-dt chain -- the
     bench.py `adaptive lane-major` row's program shape
plus the 3-row SIR ensemble at both widths (too small a state for a hand
kernel; exactly the model the generic engine exists for).

TIMING RULE: every timed region ends with a host fetch of a value derived
from the result (CLAUDE.md); fresh parameter draws per repeat; median of 3.

Run:  python probes/probe_generic_adaptive.py [B ...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import dynode_tpu

dynode_tpu.enable_compilation_cache()

import dynode_tpu.ops.multistrain_pallas as mp
from dynode_tpu.ops import (
    ensemble_solve_kernel,
    ensemble_solve_kernel_adaptive,
)

DURATION = 200.0
A, K = mp.A_DIM, mp.K_DIM


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0].block_until_ready())


def _timed(run, n, repeats=3):
    walls = []
    for rep in range(repeats):
        t0 = time.time()
        _sync(run(rep + 1))
        walls.append(time.time() - t0)
    wall = sorted(walls)[len(walls) // 2]
    return n / wall, wall


def multistrain_setup(B, seed=0):
    key = jax.random.PRNGKey(seed)
    beta0 = jnp.full((K,), 0.3)
    sigma = jnp.full((K,), 0.25)
    gamma = jnp.full((K,), 0.1)
    omega = jnp.full((K,), 0.01)
    S0 = jnp.full((A,), 0.99 / A)
    E0 = jnp.zeros((A, K)).at[:, 0].set(0.005 / A)
    I0 = jnp.zeros((A, K)).at[:, 0].set(0.005 / A)
    R0 = jnp.zeros((A, K))
    C0 = jnp.zeros((A, K))
    contact = jnp.full((A, A), 1.0 / A)
    y0 = (S0, E0, I0, R0, C0)
    contact_t = tuple(tuple(float(v) for v in row) for row in contact.tolist())

    def rhs(y, p, t):
        return mp._rhs_rows(
            y, contact_t, p[:K], p[K:2 * K], p[2 * K:3 * K], p[3 * K:4 * K],
            A, K,
        )

    yp = mp.pack_state(y0, B)

    def draws(seed):
        return 1.0 + 0.2 * jax.random.uniform(jax.random.PRNGKey(seed), (B,))

    @jax.jit
    def pack(scales):
        beta = beta0[None, :] * scales[:, None]
        return mp.pack_params(beta, sigma, gamma, omega, B)

    return rhs, yp, pack, draws


def sir_setup(B):
    def rhs(y, p, t):
        s, i, r = y
        inf = p[0] * s * i
        rec = p[1] * i
        return [-inf, inf - rec, rec]

    yp = jnp.stack(
        [jnp.full((B,), 0.99), jnp.full((B,), 0.01), jnp.zeros(B)], 0
    )

    def draws(seed):
        return jax.random.uniform(
            jax.random.PRNGKey(seed), (B,), minval=0.2, maxval=0.5
        )

    @jax.jit
    def pack(beta):
        return jnp.stack([beta, jnp.full((B,), 0.1)], 0)

    return rhs, yp, pack, draws


def main():
    widths = [int(a) for a in sys.argv[1:]] or [32768, 79872]
    print("backend:", jax.default_backend())
    for B in widths:
        rhs, yp, pack, draws = multistrain_setup(B)

        @jax.jit
        def const_run(scales):
            return ensemble_solve_kernel(
                rhs, yp, pack(scales), duration=DURATION, dt=0.5
            )

        @jax.jit
        def adapt_run(scales):
            saves, stats = ensemble_solve_kernel_adaptive(
                rhs, yp, pack(scales), duration=DURATION,
                rtol=1e-4, atol=1e-6,
            )
            return saves, stats

        _sync(const_run(draws(0)))
        tps_c, wall_c = _timed(lambda s: const_run(draws(s)), B)
        out, stats = adapt_run(draws(0))
        _sync(out)
        bad = int(np.asarray(stats["exhausted_intervals"]).sum())
        acc = np.asarray(stats["n_accepted"])
        tps_a, wall_a = _timed(lambda s: adapt_run(draws(s))[0], B)
        # accuracy gate: adaptive vs tight constant on a small slice
        ref = ensemble_solve_kernel(
            rhs, yp[:, :2048], pack(draws(0))[:, :2048],
            duration=DURATION, dt=0.05,
        )
        got, _ = ensemble_solve_kernel_adaptive(
            rhs, yp[:, :2048], pack(draws(0))[:, :2048],
            duration=DURATION, rtol=1e-4, atol=1e-6,
        )
        rel = float(
            jnp.max(jnp.abs(got - ref) / (1e-6 + jnp.abs(ref)))
        )
        print(
            f"[multistrain B={B}] const dt=0.5: {tps_c:,.0f} traj/s "
            f"({wall_c:.2f}s) | ADAPTIVE rtol=1e-4: {tps_a:,.0f} traj/s "
            f"({wall_a:.2f}s) | accepted/block mean {acc.mean():.1f} "
            f"(~{acc.mean()/DURATION:.2f}/day vs const 2.0) | exhausted {bad} "
            f"| rel err vs dt=0.05: {rel:.2e}"
        )

        rhs_s, yp_s, pack_s, draws_s = sir_setup(B)

        @jax.jit
        def sir_const(beta):
            return ensemble_solve_kernel(
                rhs_s, yp_s, pack_s(beta), duration=DURATION, dt=0.5
            )

        @jax.jit
        def sir_adapt(beta):
            return ensemble_solve_kernel_adaptive(
                rhs_s, yp_s, pack_s(beta), duration=DURATION,
                rtol=1e-4, atol=1e-6,
            )[0]

        _sync(sir_const(draws_s(0)))
        tps_sc, _ = _timed(lambda s: sir_const(draws_s(s)), B)
        _sync(sir_adapt(draws_s(0)))
        tps_sa, _ = _timed(lambda s: sir_adapt(draws_s(s)), B)
        print(
            f"[SIR B={B}] const: {tps_sc:,.0f} traj/s | "
            f"ADAPTIVE: {tps_sa:,.0f} traj/s"
        )


if __name__ == "__main__":
    main()
