"""Where does the NUTS/ChEES transition's compute go, and what would a
differentiable VMEM-kernel potential buy?

At the fit shape (multistrain, 4096 chains, constant dt=0.5, 100 days,
daily saves) measure on the TPU:

  1. pot_fwd        -- the lane-major batched potential, forward only
  2. pot_grad       -- grad of the summed potential (== per-chain grads;
                       the real per-leapfrog cost in NUTS/ChEES)
  3. rows_ref_grad  -- grad through the pure-JAX lockstep rows reference
                       (does the rows formulation alone help XLA's AD?)
  4. kernel_fwd     -- the generic whole-solve VMEM kernel, forward only
                       (the floor a custom-VJP kernel forward would pay)

If pot_grad >> ~3x kernel_fwd there is real headroom for a Pallas
fwd+bwd potential (backward ~2x forward FLOPs for RK + RHS-VJP).

Usage: python probes/probe_grad_headroom.py  (TPU; ~2 min after compiles)
"""

import sys
import time

import _bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

import bench_nuts
from dynode_tpu.ops import ensemble_solve_kernel
from dynode_tpu.ops import multistrain_pallas as mp

C = 4096
DT = 0.5
T = float(bench_nuts.DURATION)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(jnp.stack([jnp.sum(x) for x in leaves if x.size])))


def timed(name, fn, *args, repeats=5):
    fn(*args)  # compile
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(*args))
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    print(f"{name:>14}: {w * 1e3:8.1f} ms  (spread {min(walls)*1e3:.1f}-{max(walls)*1e3:.1f})", file=sys.stderr)
    return w


def main():
    model, forward = bench_nuts.build_model()
    truth = jnp.array([1.3, 1.0, 0.8])
    c = forward(truth)
    obs = np.asarray(
        jax.random.poisson(jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6))
    )
    pot = bench_nuts.build_lane_major_potential(obs)

    zb = jax.random.normal(jax.random.PRNGKey(1), (C, 3)) * 0.1

    pot_j = jax.jit(pot)
    grad_j = jax.jit(jax.grad(lambda z: jnp.sum(pot(z))))

    w_fwd = timed("pot_fwd", pot_j, zb)
    w_grad = timed("pot_grad", grad_j, zb)

    # rows formulation: same solve as a rows-reference scan, XLA AD
    from dynode_tpu.models.multistrain import (
        multistrain_config,
        multistrain_odeparams,
        multistrain_initial_state,
    )
    from dynode_tpu.config import SolverParams

    cfg = multistrain_config(solver_params=SolverParams(constant_step_size=DT))
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    contact = tuple(
        tuple(float(x) for x in row) for row in np.asarray(base.contact_matrix)
    )
    n_age, n_strain = base.contact_matrix.shape[0], base.beta.shape[0]

    y0_rows = mp.pack_state(tuple(jnp.asarray(a) for a in y0), C)

    def rows_rhs(y, p, t):
        beta = [p[k] for k in range(n_strain)]
        sigma = [p[n_strain + k] for k in range(n_strain)]
        gamma = [p[2 * n_strain + k] for k in range(n_strain)]
        omega = [p[3 * n_strain + k] for k in range(n_strain)]
        return mp._rhs_rows(y, contact, beta, sigma, gamma, omega, n_age, n_strain)

    def p_rows_of(scales):  # (C, K) -> (4K, C)
        beta = base.beta[None, :] * scales  # (C, K)
        return mp.pack_params(beta, base.sigma, base.gamma, base.omega, C)

    scales0 = jnp.ones((C, 3)) * 1.1

    def kernel_fwd(scales):
        return ensemble_solve_kernel(
            rows_rhs, y0_rows, p_rows_of(scales), duration=T, dt=DT,
            save_every=1.0, method="tsit5",
        )

    w_kern = timed("kernel_fwd", jax.jit(kernel_fwd), scales0)

    from dynode_tpu.ops.generic_pallas import ensemble_solve_kernel_reference

    def rows_ref_loss(scales):
        saves = ensemble_solve_kernel_reference(
            rows_rhs, y0_rows, p_rows_of(scales), duration=T, dt=DT,
            save_every=1.0, method="tsit5",
        )
        return jnp.sum(saves)

    w_rref = timed("rows_ref_grad", jax.jit(jax.grad(rows_ref_loss)), scales0)

    print(
        f"\npot_grad/pot_fwd = {w_grad / w_fwd:.2f}x; "
        f"pot_grad / kernel_fwd = {w_grad / w_kern:.1f}x headroom factor "
        f"(a kernel fwd+bwd at ~3x fwd would run the leapfrog gradient "
        f"~{w_grad / (3 * w_kern):.1f}x faster); rows-ref XLA grad is "
        f"{w_grad / w_rref:.2f}x the production potential's grad",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
