"""Hierarchical (partial-pooling) strain fit with ``handlers.plate``.

A standard epi workflow the reference supports through numpyro's plate
(its ``flatten_list_parameters`` exists to post-process exactly these
plated samples, /root/reference/src/dynode/utils/utils.py:45-61): strain
transmissibilities share a population-level prior, so sparse strains
borrow strength from well-observed ones instead of each getting an
independent vague prior.

    mu  ~ TruncatedNormal(1.0, 0.3)        # population-mean R0 scale
    tau ~ HalfNormal(0.3)                  # between-strain spread
    with plate("strain", 3):
        r0_scale ~ Normal(mu, tau)         # one draw per strain, (3,)

The plated site flows through NUTS/ChEES as a single 3-vector latent
(chains stay one vmapped bank; no per-strain Python loop), and
``flatten_list_parameters`` splits the posterior back into
``r0_scale_0..2`` for the reference's reporting idiom.

With this much synthetic data the centered parameterization mixes fine;
when strains are sparsely observed (small tau posterior), wrap the
plated site in ``handlers.reparam({"r0_scale": LocScaleReparam()})`` to
sample the non-centered geometry instead (see docs/inference.md and
tests/test_infer/test_reparam.py's funnel test).
"""

import _bootstrap

import jax
import jax.numpy as jnp
import numpy as np

import dynode_tpu.dist as dist
from dynode_tpu import simulate
from dynode_tpu.config import SolverParams
from dynode_tpu.infer import MCMC, NUTS, handlers, plate
from dynode_tpu.models.multistrain import (
    multistrain_config,
    multistrain_initial_state,
    multistrain_ode,
    multistrain_odeparams,
)
from dynode_tpu.utils import flatten_list_parameters

FAST = _bootstrap.fast_mode()
DURATION = 40.0 if FAST else 120.0
TRUE_SCALES = jnp.array([0.85, 1.0, 1.25])


def build_forward():
    cfg = multistrain_config(
        solver_params=SolverParams(constant_step_size=0.5)
    )
    base = multistrain_odeparams(cfg)
    y0 = multistrain_initial_state(cfg)
    sp = cfg.parameters.solver_params

    def forward(r0_scales):
        p = base.replace(beta=base.beta * r0_scales)
        sol = simulate(multistrain_ode, DURATION, y0, p, sp)
        return sol.ys[-1]  # cumulative incidence (T, ages, strains)

    return forward


def model(forward, obs=None):
    mu = handlers.sample(
        "mu", dist.TruncatedNormal(loc=1.0, scale=0.3, low=0.3, high=2.0)
    )
    tau = handlers.sample("tau", dist.HalfNormal(0.3))
    with plate("strain", 3):
        r0_scale = handlers.sample("r0_scale", dist.Normal(mu, tau))
    c = forward(jnp.clip(r0_scale, 0.2, 3.0))
    incidence = jnp.maximum(jnp.diff(c, axis=0), 1e-6)
    handlers.sample("obs_incidence", dist.Poisson(incidence), obs=obs)


if __name__ == "__main__":
    forward = build_forward()

    # synthetic observations at the true per-strain scales
    c = forward(TRUE_SCALES)
    obs = jax.random.poisson(
        jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6)
    )

    def fit_model(obs=None):
        return model(forward, obs)

    chains = 4 if FAST else 16
    warmup, draws = (60, 60) if FAST else (300, 300)
    mcmc = MCMC(
        NUTS(fit_model),
        num_warmup=warmup,
        num_samples=draws,
        num_chains=chains,
        steps_per_call=25,
    )
    mcmc.run(jax.random.PRNGKey(1), obs=obs)

    samples = mcmc.get_samples()
    scales = np.asarray(samples["r0_scale"])  # (total draws, 3)
    flat = flatten_list_parameters(
        {"r0_scale": np.asarray(mcmc.get_samples(group_by_chain=True)["r0_scale"])}
    )
    print("population mean mu:", float(np.mean(samples["mu"])))
    print("between-strain tau:", float(np.mean(samples["tau"])))
    for k in range(3):
        post = scales[:, k]
        print(
            f"strain {k}: posterior {post.mean():.3f} +- {post.std():.3f} "
            f"(true {float(TRUE_SCALES[k]):.2f}; flattened key "
            f"r0_scale_{k} -> {flat[f'r0_scale_{k}'].mean():.3f})"
        )
    err = np.abs(scales.mean(0) - np.asarray(TRUE_SCALES))
    tol = 0.25 if FAST else 0.15
    assert err.max() < tol, f"posterior drifted: {scales.mean(0)}"
    print("hierarchical fit OK")
