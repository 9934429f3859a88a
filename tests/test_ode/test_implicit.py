"""Implicit (ESDIRK) solvers: stability, order, stiff accuracy, grads.

The reference's SolverParams accepts any diffrax solver including implicit
ones (/root/reference/src/dynode/config/params.py:28-35); this pins the
in-repo stiff capability (ode/implicit.py): L-stable decay where explicit
methods explode, textbook convergence orders, the Robertson problem vs a
scipy Radau oracle, reverse-mode gradients through the Newton iterations,
ensemble vmap, and use through the public ``simulate()`` surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from dynode_tpu.ode import (
    ConstantStepSize,
    ImplicitEuler,
    ODETerm,
    PIDController,
    SaveAt,
    TRBDF2,
    Tsit5,
    diffeqsolve,
)


def lin50(t, y, args):
    return (-50.0 * y[0],)


@pytest.mark.parametrize("solver", [ImplicitEuler(), TRBDF2()])
def test_l_stable_decay_at_large_dt(solver):
    """dt * |lambda| = 25: far outside any explicit stability region."""
    sol = diffeqsolve(
        ODETerm(lin50), solver, 0.0, 10.0, 0.5, (jnp.ones(1),),
        saveat=SaveAt(ts=jnp.linspace(0, 10, 21)),
        stepsize_controller=ConstantStepSize(), max_steps=64,
    )
    y = np.asarray(sol.ys[0]).ravel()
    assert np.all(np.abs(y) <= 1.0)
    assert abs(y[-1]) < 1e-6


def test_explicit_euler_analogue_would_explode():
    """Control for the test above: the same dt with an explicit method
    leaves the stability region (|1 + dt*lambda| = 24 per step)."""
    from dynode_tpu.ode import Euler

    sol = diffeqsolve(
        ODETerm(lin50), Euler(), 0.0, 5.0, 0.5, (jnp.ones(1),),
        saveat=SaveAt(ts=jnp.asarray([5.0])),
        stepsize_controller=ConstantStepSize(), max_steps=32,
    )
    assert abs(float(sol.ys[0][-1, 0])) > 1e6


@pytest.mark.parametrize(
    "solver,order", [(ImplicitEuler(), 1), (TRBDF2(), 2)]
)
def test_convergence_order(solver, order):
    def logistic(t, y, args):
        return (y[0] * (1.0 - y[0]),)

    exact = 1.0 / (1.0 + 9.0 * np.exp(-2.0))
    errs = []
    for dt in (0.2, 0.1, 0.05):
        sol = diffeqsolve(
            ODETerm(logistic), solver, 0.0, 2.0, dt, (jnp.asarray([0.1]),),
            saveat=SaveAt(ts=jnp.asarray([2.0])),
            stepsize_controller=ConstantStepSize(), max_steps=256,
        )
        errs.append(abs(float(sol.ys[0][-1, 0]) - exact))
    rate = np.log2(errs[0] / errs[2]) / 2.0
    assert rate > order - 0.25, (errs, rate)


def _rober_np(t, y):
    return np.array([
        -0.04 * y[0] + 1e4 * y[1] * y[2],
        0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
        3e7 * y[1] ** 2,
    ])


def test_robertson_vs_scipy_radau():
    """The canonical stiff benchmark: rate constants spanning 9 orders of
    magnitude. Adaptive TRBDF2 must match a tight Radau reference."""

    def rober(t, y, args):
        y1, y2, y3 = y[0][0], y[0][1], y[0][2]
        return (
            jnp.stack([
                -0.04 * y1 + 1e4 * y2 * y3,
                0.04 * y1 - 1e4 * y2 * y3 - 3e7 * y2**2,
                3e7 * y2**2,
            ]),
        )

    sol = diffeqsolve(
        ODETerm(rober), TRBDF2(), 0.0, 100.0, None,
        (jnp.asarray([1.0, 0.0, 0.0]),),
        saveat=SaveAt(ts=jnp.asarray([1.0, 10.0, 100.0])),
        stepsize_controller=PIDController(rtol=1e-6, atol=1e-10),
        max_steps=4096,
    )
    assert int(sol.result) == 0
    ref = solve_ivp(
        _rober_np, (0, 100), [1.0, 0.0, 0.0], method="Radau",
        t_eval=[1.0, 10.0, 100.0], rtol=1e-10, atol=1e-12,
    ).y.T
    np.testing.assert_allclose(
        np.asarray(sol.ys[0]), ref, rtol=5e-4, atol=1e-9
    )
    # mass conservation is exact for this system
    totals = np.asarray(sol.ys[0]).sum(axis=-1)
    np.testing.assert_allclose(totals, 1.0, rtol=1e-9)


def test_grad_through_implicit_solve():
    def loss(k):
        def f(t, y, args):
            return (-k * y[0],)

        s = diffeqsolve(
            ODETerm(f), TRBDF2(), 0.0, 1.0, None, (jnp.ones(1),),
            saveat=SaveAt(ts=jnp.asarray([1.0])),
            stepsize_controller=PIDController(rtol=1e-8, atol=1e-10),
            max_steps=512,
        )
        return s.ys[0][-1, 0]

    g = float(jax.grad(loss)(2.0))
    assert abs(g + np.exp(-2.0)) < 1e-5  # d/dk exp(-k) at k=2


def test_vmap_ensemble_of_implicit_solves():
    def f(t, y, args):
        return (-args * y[0],)

    def solve_one(k):
        s = diffeqsolve(
            ODETerm(f), TRBDF2(), 0.0, 1.0, 0.02, (jnp.ones(1),), k,
            saveat=SaveAt(ts=jnp.asarray([1.0])),
            stepsize_controller=ConstantStepSize(), max_steps=64,
        )
        return s.ys[0][-1, 0]

    ks = jnp.linspace(0.5, 3.0, 8)
    out = jax.jit(jax.vmap(solve_one))(ks)
    np.testing.assert_allclose(
        np.asarray(out), np.exp(-np.asarray(ks)), rtol=1e-3
    )


def test_implicit_through_public_simulate():
    """SolverParams(solver_method=TRBDF2()) drives the stiff path through
    the same public surface the reference exposes for diffrax solvers."""
    from dynode_tpu import simulate
    from dynode_tpu.config import SolverParams
    from dynode_tpu.models.sir import SIRParams, sir_age_config, sir_ode
    from dynode_tpu.infer import sample_then_resolve

    cfg = sir_age_config()
    tp = sample_then_resolve(cfg.parameters.transmission_params)
    strain = tp.strains[0]
    p = SIRParams(
        beta=jnp.asarray(strain.r0 / strain.infectious_period),
        gamma=jnp.asarray(1.0 / strain.infectious_period),
        contact_matrix=tp.contact_matrix,
    )
    y0 = cfg.initializer.get_initial_state()
    sp_stiff = SolverParams(
        solver_method=TRBDF2(),
        ode_solver_rel_tolerance=1e-7,
        ode_solver_abs_tolerance=1e-9,
    )
    sol = simulate(sir_ode, 50, y0, p, sp_stiff)
    assert int(sol.result) == 0
    sp_ref = SolverParams(
        solver_method=Tsit5(),
        ode_solver_rel_tolerance=1e-9,
        ode_solver_abs_tolerance=1e-11,
    )
    ref = simulate(sir_ode, 50, y0, p, sp_ref)
    for a, b in zip(sol.ys, ref.ys):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_implicit_with_discontinuity_points():
    """jump_ts clipping composes with the implicit stepper: piecewise
    vector field -lambda1*y then -lambda2*y switching at t=1 (gradient
    discontinuity), checked against the exact piecewise solution."""
    from dynode_tpu.ode import ClipStepSizeController

    def f(t, y, args):
        lam = jnp.where(t < 1.0, 2.0, 0.5)
        return (-lam * y[0],)

    controller = ClipStepSizeController(
        PIDController(rtol=1e-8, atol=1e-10), jump_ts=[1.0]
    )
    sol = diffeqsolve(
        ODETerm(f), TRBDF2(), 0.0, 2.0, None, (jnp.ones(1),),
        saveat=SaveAt(ts=jnp.asarray([0.5, 1.0, 1.5, 2.0])),
        stepsize_controller=controller, max_steps=1024,
    )
    got = np.asarray(sol.ys[0]).ravel()
    want = np.array([
        np.exp(-2 * 0.5),
        np.exp(-2 * 1.0),
        np.exp(-2.0) * np.exp(-0.5 * 0.5),
        np.exp(-2.0) * np.exp(-0.5 * 1.0),
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nuts_through_implicit_solve():
    """The full composition: NUTS gradients through the TRBDF2 Newton
    iterations inside the checkpointed scan (decay-rate recovery)."""
    import dynode_tpu.dist as dist
    from dynode_tpu import simulate
    from dynode_tpu.config import SolverParams
    from dynode_tpu.infer import MCMC, NUTS, handlers

    sp = SolverParams(
        solver_method=TRBDF2(),
        ode_solver_rel_tolerance=1e-6,
        ode_solver_abs_tolerance=1e-8,
    )
    true_k = 1.3
    ts_obs = jnp.linspace(0.5, 4.0, 8)

    def decay(t, y, args):
        return (-args * y[0],)

    def observe(k):
        sol = simulate(decay, 4, (jnp.asarray([100.0]),), k, sp)
        return sol.ys[0][:, 0]

    data = observe(jnp.asarray(true_k)) + jnp.asarray(
        np.random.default_rng(0).normal(0, 0.1, 5)
    )

    def model(obs=None):
        k = handlers.sample("k", dist.LogNormal(0.0, 0.5))
        handlers.sample("y", dist.Normal(observe(k), 0.1), obs=obs)

    m = MCMC(NUTS(model, max_tree_depth=6), num_warmup=100,
             num_samples=100, num_chains=2)
    m.run(jax.random.PRNGKey(0), obs=data)
    k_post = np.asarray(m.get_samples()["k"])
    assert abs(k_post.mean() - true_k) < 0.05
    assert int(np.asarray(m.get_extra_fields()["diverging"]).sum()) == 0
