"""Micro-decomposition of one ChEES transition at 4096 chains.

probe_chees_profile.py showed ~850-900 ms/sampling transition vs a
5.4-leapfrog x 43.7 ms = 237 ms "unit" share, but coarse whole-run walls
are too noisy on the shared tunnel to locate the other ~650 ms. This
probe times the building blocks DIRECTLY (each jitted alone, min-of-3,
fetch-synced, fresh inputs):

  unit  one bank potential+grad eval
  W5    while_loop of exactly 5 leapfrog iterations (same carry as
        chees_transition) -> is the loop body more expensive than unit?
  T1    one full chees_transition (fixed eps/traj)
  S25   lax.scan of 25 transitions (the compiled sampling chunk shape)

If W5/5 >> unit, the overhead is while_loop iteration cost (no fusion
across the data-dependent loop); if T1 >> W5 + unit-ish, it is the
momentum/accept/select bookkeeping; if S25/25 >> T1, it is cross-
transition (collection writes, scan carry traffic).
"""

import _bootstrap  # noqa: F401

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_nuts
from dynode_tpu.infer.chees import (
    chees_transition,
    init_bank_state,
)
from dynode_tpu.infer.util import (
    flatten_potential,
    get_model_trace,
    get_transforms,
    initialize_latents,
    make_potential_fn,
    observed_logprob_centers,
    unconstrain_sample,
)

model, forward = bench_nuts.build_model()
true_scales = jnp.array([1.1, 0.95, 1.05])
c = forward(true_scales)
obs = jax.random.poisson(
    jax.random.PRNGKey(0), jnp.maximum(jnp.diff(c, axis=0), 1e-6)
)

N = 4096


def _sync(x):
    return float(
        sum(np.asarray(jax.device_get(v)).sum()
            for v in jax.tree_util.tree_leaves(x))
    )


def _time(fn, *args, reps=3):
    _sync(fn(*args))  # compile
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


tr = get_model_trace(model, jax.random.PRNGKey(2), obs=obs)
transforms = get_transforms(tr)
centers = observed_logprob_centers(tr)
init = initialize_latents(tr, jax.random.PRNGKey(3))
flat_pot, flat0, _ = flatten_potential(
    make_potential_fn(model, (), {"obs": obs}, transforms, centers=centers),
    unconstrain_sample(transforms, init),
)
pg_bank = jax.vmap(jax.value_and_grad(flat_pot))
D = flat0.shape[0]
zb = jnp.tile(flat0[None], (N, 1)) + 0.01 * jax.random.normal(
    jax.random.PRNGKey(9), (N, D)
)

unit = _time(jax.jit(lambda z: pg_bank(z)[0]), zb)
print(f"unit (1 pot+grad)          {unit * 1e3:8.1f} ms", flush=True)

eps = jnp.float32(0.05)
inv_mass = jnp.ones((D,), jnp.float32)
chol = jnp.ones((D,), jnp.float32)
state = init_bank_state(pg_bank, zb, jax.random.PRNGKey(4))
traj = 5.0 * eps  # ceil(u*traj/eps) <= 5 leapfrogs; Halton u makes ~mean 3

# --- W5: bare while_loop of exactly 5 leapfrog iterations ----------------


def w5(z, r):
    def cond(carry):
        return carry[0] < 5

    def body(carry):
        i, z, r, pe, g = carry
        r_half = r - 0.5 * eps * g
        z = z + eps * (inv_mass * r_half)
        pe, g = pg_bank(z)
        r = r_half - 0.5 * eps * g
        return i + 1, z, r, pe, g

    pe0, g0 = pg_bank(z)
    out = jax.lax.while_loop(cond, body, (jnp.int32(0), z, r, pe0, g0))
    return out[3]


r0 = jax.random.normal(jax.random.PRNGKey(5), (N, D))
t_w5 = _time(jax.jit(w5), zb, r0)
print(
    f"W5 (5-leapfrog while_loop) {t_w5 * 1e3:8.1f} ms  "
    f"({t_w5 / (6 * unit):.2f}x of 6 units incl. initial eval)",
    flush=True,
)

# --- T1: one full chees_transition ---------------------------------------


def t1(st):
    new, aux = chees_transition(pg_bank, inv_mass, chol, eps, traj, 1024, st)
    return new.potential


t_t1 = _time(jax.jit(t1), state)
print(f"T1 (1 chees_transition)    {t_t1 * 1e3:8.1f} ms", flush=True)

# --- S25: scan of 25 transitions with z collection (sampling chunk) ------


def s25(st):
    def step(s, _):
        new, aux = chees_transition(
            pg_bank, inv_mass, chol, eps, traj, 1024, s
        )
        return new, (new.z, new.accept_prob, new.num_steps)

    final, out = jax.lax.scan(step, st, jnp.arange(25))
    return final.potential, out[0]


t_s25 = _time(jax.jit(s25), state)

print(
    f"S25 (25-transition scan)   {t_s25 * 1e3:8.1f} ms  "
    f"-> {t_s25 / 25 * 1e3:.1f} ms/transition",
    flush=True,
)
