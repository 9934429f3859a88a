"""Exact 2-D posterior oracle for the PRODUCTION (SEIP) fit by quadrature.

Extends the flagship SIR oracle (gen_quadrature.py) to the production
model family: the reduced-rank SEIP fit defined canonically in
tests/test_infer/test_seip_quadrature.py (every SEIP mechanism active:
immune-history strata, seasonal-vax sin^1000 reset inside the window,
waning protections, external introduction, seasonal forcing).

Independence: the likelihood surface is computed with scipy's DOP853 at
rtol=1e-8 (solver-independent of dynode_tpu.ode) and scipy.stats priors /
gammaln Poisson pmf (sampler- and distribution-independent). The RHS
itself is the library's ``seip_ode`` evaluated in f64 -- rewriting the
640-state equations in numpy would re-verify transcription rather than
semantics; RHS-level correctness is pinned separately (conservation and
structure tests, tests/test_dynamics/test_seip.py, and the f64 oracle
probes). So this golden certifies solver+sampler+distribution parity.

Staging mirrors gen_quadrature.py: coarse scan -> Nelder-Mead mode ->
full 2x2 Hessian -> rotated principal-axes fine grid (sigma/5 spacing to
+-7 sigma; trapezoid on a near-Gaussian is spectrally accurate, tail mass
~1e-11), edge-mass assertion.

    python tests/golden/gen_seip_quadrature.py   # ~20-30 min on CPU,
                                                 # writes seip_quadrature.npz
"""

import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from scipy.integrate import solve_ivp  # noqa: E402
from scipy.special import gammaln  # noqa: E402
from scipy.stats import truncnorm  # noqa: E402

from test_infer.test_seip_quadrature import (  # noqa: E402
    DT,
    FIT_DAYS,
    PRIOR_HI,
    PRIOR_LO,
    PRIOR_LOC,
    PRIOR_SCALE,
    build_fit,
    make_obs,
)
from dynode_tpu.models.seip import seip_ode  # noqa: E402

SIGMA_SPACING = 5.0  # grid spacing = sigma / SIGMA_SPACING
SIGMA_SPAN = 7.0  # grid reach = +- SIGMA_SPAN sigmas


def main():
    cfg, base, y0, sp = build_fit()
    obs = np.asarray(make_obs(base, y0, sp), dtype=np.float64)
    lgamma_obs = gammaln(obs + 1.0)

    shapes = [tuple(a.shape) for a in y0]
    sizes = [int(np.prod(s)) for s in shapes]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    y0f = np.concatenate([np.asarray(a, np.float64).ravel() for a in y0])

    @jax.jit
    def rhs_flat(t, yf, scales):
        state = tuple(
            yf[offs[i]: offs[i + 1]].reshape(shapes[i]) for i in range(4)
        )
        p = base.replace(beta=base.beta * scales)
        dy = seip_ode(t, state, p)
        return jnp.concatenate([d.reshape(-1) for d in dy])

    def solve_inc(scales):
        """Per-strain daily incidence on the save grid (scipy DOP853)."""
        sc = jnp.asarray(scales, jnp.float64)
        sol = solve_ivp(
            lambda t, y: np.asarray(rhs_flat(t, y, sc)),
            (0.0, float(FIT_DAYS)),
            y0f,
            t_eval=np.arange(0.0, FIT_DAYS + 1.0),
            rtol=1e-8,
            atol=1e-6,  # absolute scale: 1e5 persons
            method="DOP853",
        )
        assert sol.success, sol.message
        c = sol.y[offs[3]: offs[4], :].T.reshape(FIT_DAYS + 1, *shapes[3])
        cum = c.sum(axis=(1, 2, 3))
        return np.maximum(np.diff(cum, axis=0), 1e-6)

    a = (PRIOR_LO - PRIOR_LOC) / PRIOR_SCALE
    b = (PRIOR_HI - PRIOR_LOC) / PRIOR_SCALE

    def log_posterior(s1, s2):
        mu = solve_inc((s1, s2))
        loglik = float(np.sum(obs * np.log(mu) - mu - lgamma_obs))
        lp = truncnorm.logpdf(
            np.array([s1, s2]), a, b, loc=PRIOR_LOC, scale=PRIOR_SCALE
        ).sum()
        return loglik + lp

    t_start = time.time()

    # stage 1: coarse scan around the generating point
    g1 = np.linspace(0.95, 1.25, 13)
    g2 = np.linspace(0.75, 1.05, 13)
    lp_c = np.array([[log_posterior(x, y) for y in g2] for x in g1])
    i0, j0 = np.unravel_index(np.argmax(lp_c), lp_c.shape)
    on_edge = float(
        i0 in (0, g1.size - 1) or j0 in (0, g2.size - 1)
    )
    s1_hat, s2_hat = float(g1[i0]), float(g2[j0])
    print(f"coarse mode: ({s1_hat:.4f}, {s2_hat:.4f}) edge={on_edge} "
          f"[{time.time()-t_start:.0f}s]")
    assert on_edge == 0.0, "coarse box does not contain the mode"

    # stage 2: exact mode by Nelder-Mead
    from scipy.optimize import minimize

    res = minimize(
        lambda x: -log_posterior(x[0], x[1]),
        np.array([s1_hat, s2_hat]),
        method="Nelder-Mead",
        options={"xatol": 1e-7, "fatol": 1e-9, "maxfev": 300},
    )
    s1_hat, s2_hat = float(res.x[0]), float(res.x[1])
    print(f"refined mode: ({s1_hat:.6f}, {s2_hat:.6f}) "
          f"[{time.time()-t_start:.0f}s]")

    # stage 3: full 2x2 Hessian -> Laplace covariance
    f = log_posterior
    h = 2e-3
    f00 = f(s1_hat, s2_hat)
    d11 = (f(s1_hat + h, s2_hat) - 2 * f00 + f(s1_hat - h, s2_hat)) / h**2
    d22 = (f(s1_hat, s2_hat + h) - 2 * f00 + f(s1_hat, s2_hat - h)) / h**2
    d12 = (
        f(s1_hat + h, s2_hat + h)
        - f(s1_hat + h, s2_hat - h)
        - f(s1_hat - h, s2_hat + h)
        + f(s1_hat - h, s2_hat - h)
    ) / (4 * h * h)
    hess = -np.array([[d11, d12], [d12, d22]])
    cov_l = np.linalg.inv(hess)
    print(f"laplace: sig=({np.sqrt(cov_l[0,0]):.5f}, "
          f"{np.sqrt(cov_l[1,1]):.5f}) "
          f"rho={cov_l[0,1]/np.sqrt(cov_l[0,0]*cov_l[1,1]):.4f}")

    # stage 4: rotated principal-axes fine grid
    evals, evecs = np.linalg.eigh(cov_l)
    sig_u = np.sqrt(evals)
    n_side = int(np.ceil(SIGMA_SPAN * SIGMA_SPACING))
    u1 = sig_u[0] / SIGMA_SPACING * np.arange(-n_side, n_side + 1)
    u2 = sig_u[1] / SIGMA_SPACING * np.arange(-n_side, n_side + 1)
    U1, U2 = np.meshgrid(u1, u2, indexing="ij")
    pts = (
        np.array([s1_hat, s2_hat])[None, :]
        + np.stack([U1.ravel(), U2.ravel()], axis=-1) @ evecs.T
    )
    assert pts.min() > PRIOR_LO and pts.max() < PRIOR_HI
    print(f"fine grid: {u1.size}^2 = {pts.shape[0]} solves")
    lp = np.empty(pts.shape[0])
    for idx, p in enumerate(pts):
        lp[idx] = f(float(p[0]), float(p[1]))
        if idx % 500 == 0:
            print(f"  {idx}/{pts.shape[0]} [{time.time()-t_start:.0f}s]")
    lp = lp.reshape(u1.size, u2.size)

    w = np.exp(lp - lp.max())
    w /= w.sum()
    edge = w[0, :].sum() + w[-1, :].sum() + w[:, 0].sum() + w[:, -1].sum()
    print(f"edge mass: {edge:.3e}")
    assert edge < 1e-8, "fine grid does not contain the posterior"

    wf = w.ravel()
    s1v, s2v = pts[:, 0], pts[:, 1]
    mean = np.array([wf @ s1v, wf @ s2v])
    var = np.array(
        [wf @ (s1v - mean[0]) ** 2, wf @ (s2v - mean[1]) ** 2]
    )
    cov12 = float(wf @ ((s1v - mean[0]) * (s2v - mean[1])))
    std = np.sqrt(var)
    print(f"posterior mean=({mean[0]:.6f}, {mean[1]:.6f}) "
          f"std=({std[0]:.6f}, {std[1]:.6f}) "
          f"rho={cov12/(std[0]*std[1]):.4f} "
          f"[{time.time()-t_start:.0f}s total]")

    out = pathlib.Path(__file__).parent / "seip_quadrature.npz"
    np.savez(
        out,
        obs=obs,
        mean=mean,
        std=std,
        cov=np.array([[var[0], cov12], [cov12, var[1]]]),
        mode=np.array([s1_hat, s2_hat]),
        edge_mass=np.array(edge),
        coarse_mode_on_boundary=np.array(on_edge),
        meta_rtol=np.array(1e-8),
        meta_grid=np.array([u1.size, u2.size]),
        meta_fit_days=np.array(FIT_DAYS),
        meta_dt_sampler_side=np.array(DT),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
