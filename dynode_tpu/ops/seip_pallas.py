"""Whole-solve-in-VMEM Pallas kernel for the production SEIP model.

The SEIP ensemble is the one workload where the generic XLA path is far
from its roofline: each Tsit5 stage round-trips the 640-float state through
HBM (measured ~20k traj/s at B=4096 on v5e-1, vs a ~67k ceiling even at
PERFECT stage fusion; see docs/ops.md roofline). This kernel keeps the
state AND every RK stage resident in VMEM for the entire solve — the only
HBM traffic is the save grid.

Design (informed by the round-2 multistrain-kernel negative results):

- **Member-tile layout**: each state element is an (8, 128) tile whose
  sublanes × lanes are 1024 ensemble members; structure dims (age A,
  immune history J, vax dose K, waning M / strain L) are LEADING dims.
  Every structural shift (waning chain, dose flows, recovery η, seasonal
  reset) indexes leading dims only → whole-tile moves, never the
  sublane-misaligned slices that poisoned the round-2 2-D kernel.
- **Classic RK4** (not Tsit5): its tableau is diagonal — stage i needs
  only k_{i-1} — so the live set is 4 state-sized ref groups (y, stage
  input, k, accumulator) ≈ 10.5 MB at 1024 members, fitting v5e's ~16 MB
  VMEM. Tsit5's dense tableau needs 6 live stages (~18 MB: does not fit).
- **Time-dependent coefficients computed on the scalar unit** per stage
  (seasonal forcing, sin^1000 vaccination-season pulse, introduction
  pulses, cubic vaccination-uptake splines evaluated with unrolled
  static-knot arithmetic) — runs concurrently with the VPU tile work.
- **Static base parameters**: the SEIPParams tensors are host-fetched and
  baked into the compiled kernel (hashable closure constants); the
  per-member axis is the transmission scale row, the production-fit
  parameterization (examples/seip_fit.py). Recompiles when base params
  change; re-runs with fresh scales hit the jit cache.

Reference counterpart: the model the reference only documents
(/root/reference/ode_model.md:15-232); RHS semantics match
``models/seip.py::seip_ode`` (equivalence-tested member-for-member against
an RK4 lax.scan reference in tests/test_ops/test_seip_pallas.py).
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
BLOCK = SUB * LANE  # 1024 members per Pallas program


def _np_tuple(x):
    """Host-fetch an array into a nested tuple (hashable static closure)."""
    arr = np.asarray(jax.device_get(x), dtype=np.float64)
    if arr.ndim == 0:
        return float(arr)
    return tuple(_np_tuple(a) for a in arr)


# ---------------------------------------------------------------------------
# packing helpers: global member g = block*1024 + sub*128 + lane
#   <-> array position [..., sub, block*128 + lane]
# ---------------------------------------------------------------------------


def pack_members(x: jnp.ndarray) -> jnp.ndarray:
    """(..., B) member-last -> (..., 8, 128*nb) tile layout."""
    *lead, B = x.shape
    nb = B // BLOCK
    x = x.reshape(*lead, nb, SUB, LANE)
    x = jnp.moveaxis(x, -3, -2)  # (..., 8, nb, 128)
    return x.reshape(*lead, SUB, nb * LANE)


def unpack_members(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 128*nb) tile layout -> (..., B) member-last."""
    *lead, _, nl = x.shape
    nb = nl // LANE
    x = x.reshape(*lead, SUB, nb, LANE)
    x = jnp.moveaxis(x, -2, -3)  # (..., nb, 8, 128)
    return x.reshape(*lead, nb * SUB * LANE)


def _norm_scales(beta_scales, n_strains: int, dtype) -> jnp.ndarray:
    """Normalize ``beta_scales`` to the (L, B) per-strain-per-member form.

    Accepts the original (B,) shared-across-strains row (broadcast to every
    strain) or the (L, B) per-strain form the production fit's posterior
    draws have (examples/seip_fit.py samples one scale per strain) --
    posterior-predictive forecasting feeds the latter straight into the
    kernels.
    """
    s = jnp.asarray(beta_scales, dtype)
    if s.ndim == 1:
        s = jnp.broadcast_to(s[None, :], (n_strains,) + s.shape)
    if s.ndim != 2 or s.shape[0] != n_strains:
        raise ValueError(
            f"beta_scales must be (B,) or (n_strains={n_strains}, B); got "
            f"{jnp.shape(beta_scales)}"
        )
    return s


# ---------------------------------------------------------------------------
# in-kernel scalar helpers (traced scalar t; static numpy coefficients)
# ---------------------------------------------------------------------------


def _spline_scalar(t, knots, base, kcoef):
    """Cubic uptake spline at scalar t for one (age, dose): a + bt + ct^2 +
    dt^3 + sum_i c_i (t - k_i)^3 [t > k_i] (utils/splines.py semantics)."""
    a, b, c, d = base
    v = a + b * t + c * t * t + d * t * t * t
    for kn, cf in zip(knots, kcoef):
        if cf != 0.0:
            dt_ = t - kn
            v = v + cf * jnp.where(dt_ > 0.0, dt_ * dt_ * dt_, 0.0)
    return v


# ---------------------------------------------------------------------------
# the shared in-kernel RHS (closure over static host parameters)
# ---------------------------------------------------------------------------


def _build_rhs(P, dims, seasonal, scale):
    """Build the in-kernel SEIP RHS closure shared by the constant-step and
    adaptive kernels.

    ``dst``/``src`` are 4-tuples of VMEM refs in member-tile layout
    (structure dims leading, (8, 128) member tiles trailing); ``t`` is a
    traced scalar evaluated on the scalar unit. ``scale`` is a length-L
    sequence of (8, 128) per-member transmission-scale tiles, one per
    strain (the production-fit parameterization samples one scale per
    strain, examples/seip_fit.py). Semantics match
    ``models/seip.py::seip_ode`` (reference model: /root/reference/ode_model.md:15-232).
    """
    A, J, K, M, L = dims

    # static coefficient tables as numpy for closure arithmetic
    contact = np.asarray(P.contact)  # (A, A)
    pop = np.asarray(P.pop)  # (A,)
    beta = np.asarray(P.beta)  # (L,)
    sigma = np.asarray(P.sigma)
    gamma = np.asarray(P.gamma)
    omega = np.asarray(P.omega)  # (M,)
    escape = np.asarray(P.escape)  # (L, J, K, M)
    eta_to = P.eta_to  # (J, L) -> target history (static ints)
    mask = np.asarray(P.intro_age_mask)  # (L, A)

    def rhs(dst, src, t):
        dS, dE, dI, dC = dst
        S, E, I, C = src
        # ---- time scalars (scalar unit; VPU-independent) -----------------
        season = 1.0 + P.season_amp * jnp.cos(
            2.0 * jnp.pi * (t - P.season_peak) / 365.0
        )
        pulses = []
        for l in range(L):
            if P.intro_perc[l] != 0.0:
                z = (t - P.intro_time[l]) / P.intro_scale[l]
                pulses.append(
                    P.intro_perc[l]
                    * jnp.exp(-0.5 * z * z)
                    / (P.intro_scale[l] * math.sqrt(2.0 * math.pi))
                )
            else:
                pulses.append(None)
        # clip matches seip_ode's jnp.clip(nu, 0.0, None): a spline segment
        # dipping negative must not un-vaccinate
        nu = [
            [
                jnp.maximum(
                    _spline_scalar(
                        t,
                        P.vax_knots[a][kk],
                        P.vax_base_coeffs[a][kk],
                        P.vax_knot_coeffs[a][kk],
                    ),
                    0.0,
                )
                for kk in range(K)
            ]
            for a in range(A)
        ]
        phi = None
        if seasonal:
            sphi = jnp.sin(2.0 * jnp.pi * (t + P.seasonal_vax_tau) / 730.0)
            # exactly the model's sin^1000 pulse (lax.integer_pow is what
            # jnp lowers s**1000 to, so stage math matches seip_ode)
            phi = jax.lax.integer_pow(sphi, 1000)

        # ---- force of infection -----------------------------------------
        # infectious[a][l]: (8,128) = sum_{j,k} I + external intro pulse
        inf_al = []
        for a in range(A):
            row = []
            for l in range(L):
                v = jnp.sum(I[a, :, :, l], axis=(0, 1))
                if pulses[l] is not None and mask[l, a] != 0.0:
                    v = v + pulses[l] * float(mask[l, a] * pop[a])
                row.append(v)
            inf_al.append(row)
        lam = []
        for a in range(A):
            row = []
            for l in range(L):
                mixed = None
                for b in range(A):
                    term = float(contact[a, b]) * inf_al[b][l]
                    mixed = term if mixed is None else mixed + term
                row.append(
                    float(beta[l] / pop[a]) * season * scale[l] * mixed
                )
            lam.append(row)

        # ---- S: infection out; E/I/C: exposure chain ---------------------
        # escape is STATIC host data; Pallas kernels cannot capture traced
        # constant arrays, so the (L,J,K,M) contraction is unrolled into
        # scalar-immediate x (8,128)-tile FMAs (J=K=M=L=4 -> cheap).
        for a in range(A):
            for j in range(J):
                for kk in range(K):
                    # dS[a,j,k,m] = -(sum_l escape[l,j,k,m] lam[a,l]) S
                    for m in range(M):
                        coeff = None
                        for l in range(L):
                            e = float(escape[l, j, kk, m])
                            if e == 0.0:
                                continue
                            term = e * lam[a][l]
                            coeff = term if coeff is None else coeff + term
                        dS[a, j, kk, m] = (
                            -coeff * S[a, j, kk, m]
                            if coeff is not None
                            else jnp.zeros_like(S[a, j, kk, m])
                        )
                    # new_exposed[a,j,k,l] =
                    #     lam[a,l] * sum_m escape[l,j,k,m] S[a,j,k,m]
                    for l in range(L):
                        acc = None
                        for m in range(M):
                            e = float(escape[l, j, kk, m])
                            if e == 0.0:
                                continue
                            term = e * S[a, j, kk, m]
                            acc = term if acc is None else acc + term
                        ne = (
                            lam[a][l] * acc
                            if acc is not None
                            else jnp.zeros_like(lam[a][l])
                        )
                        dE[a, j, kk, l] = ne - float(sigma[l]) * E[a, j, kk, l]
                        dC[a, j, kk, l] = ne
                        dI[a, j, kk, l] = (
                            float(sigma[l]) * E[a, j, kk, l]
                            - float(gamma[l]) * I[a, j, kk, l]
                        )
        # recovery into immune history eta(j,l), waning bin m=0
        for j in range(J):
            for l in range(L):
                h = eta_to[j][l]
                dS[:, h, :, 0] = dS[:, h, :, 0] + float(gamma[l]) * I[:, j, :, l]

        # ---- vaccination uptake (state-dependent saturated rates) --------
        for a in range(A):
            for kk in range(K):
                sbd = jnp.sum(S[a, :, kk, :], axis=(0, 1))  # (8,128)
                rate = jnp.minimum(
                    nu[a][kk] * float(pop[a]) / jnp.maximum(sbd, 1e-8), 1.0
                )
                if kk < K - 1:
                    out = rate * S[a, :, kk, :]  # (J,M,8,128)
                    dS[a, :, kk, :] = dS[a, :, kk, :] - out
                    dS[a, :, kk + 1, 0] = dS[a, :, kk + 1, 0] + jnp.sum(
                        out, axis=1
                    )
                else:
                    # top tier: boosting recycles waned (m>0) back to m=0
                    out = rate * S[a, :, kk, 1:]  # (J,M-1,8,128)
                    dS[a, :, kk, 1:] = dS[a, :, kk, 1:] - out
                    dS[a, :, kk, 0] = dS[a, :, kk, 0] + jnp.sum(out, axis=1)

        # ---- seasonal vaccination reset (top tier -> previous tier) ------
        if seasonal:
            for X, dX in ((S, dS), (E, dE), (I, dI)):
                shift = phi * X[:, :, K - 1]
                dX[:, :, K - 2] = dX[:, :, K - 2] + shift
                dX[:, :, K - 1] = dX[:, :, K - 1] - shift

        # ---- waning chain m -> m+1 (omega[M-1] == 0) ---------------------
        for m in range(M - 1):
            if omega[m] != 0.0:
                w = float(omega[m]) * S[:, :, :, m]
                dS[:, :, :, m] = dS[:, :, :, m] - w
                dS[:, :, :, m + 1] = dS[:, :, :, m + 1] + w

    return rhs


# ---------------------------------------------------------------------------
# the constant-step kernel
# ---------------------------------------------------------------------------


def _seip_kernel(
    *refs,
    P,  # static parameter namespace (nested tuples/floats)
    dims,  # (A, J, K, M, L)
    dt: float,
    n_steps: int,
    save_stride: int,
    seasonal: bool,
    save_mask: Tuple[bool, bool, bool, bool],
):
    n_out = sum(save_mask)
    (s0_ref, e0_ref, i0_ref, c0_ref, scale_ref) = refs[:5]
    refs_out_saved = refs[5:5 + n_out]
    (
        y_S, y_E, y_I, y_C,
        st_S, st_E, st_I, st_C,
        k_S, k_E, k_I, k_C,
        ac_S, ac_E, ac_I, ac_C,
    ) = refs[5 + n_out:5 + n_out + 16]
    # Saves are PIPELINED (round 4): every saved compartment is copied into
    # a VMEM staging ref (casting to the save dtype when narrow), its DMA
    # is STARTED, and the wait is deferred until just before the staging
    # ref is next overwritten -- a full save_stride of RK steps later. The
    # old stage->start->wait sequence stalled the VPU for the whole DMA at
    # every save point, which at full-4-compartment saves quadrupled the
    # stall. One semaphore per compartment keeps each wait tied to its own
    # copy (a shared DMA semaphore can be satisfied by another copy's
    # bytes, which would let a staging overwrite race an in-flight read).
    refs_stage = refs[5 + n_out + 16:5 + n_out + 16 + n_out]
    sem = refs[5 + n_out + 16 + n_out]
    blk = pl.program_id(0)

    # (L, 8, 128) per-strain per-member transmission scales; leading-dim
    # indexing is a whole-tile slice (the layout rule this kernel is built
    # around), so the per-strain list costs nothing over a shared tile.
    scale = scale_ref[...]
    rhs = _build_rhs(
        P, dims, seasonal, [scale[l] for l in range(dims[-1])]
    )

    refs_y = (y_S, y_E, y_I, y_C)
    refs_st = (st_S, st_E, st_I, st_C)
    refs_k = (k_S, k_E, k_I, k_C)
    refs_ac = (ac_S, ac_E, ac_I, ac_C)
    refs_in = (s0_ref, e0_ref, i0_ref, c0_ref)
    # selective saves: unsaved compartments never touch HBM at all -- the
    # (n_saves x state x B) output buffer is what bounds ensemble width
    # (full-4 daily f32 saves: 640 floats x 201 saves x B = 7.9 GiB at
    # B=16384; bf16 halves it, and packed=True output avoids the 2x
    # unpack copy that used to push wide configs over HBM)
    refs_y_saved = tuple(
        y for y, m in zip(refs_y, save_mask) if m
    )

    for y, src in zip(refs_y, refs_in):
        y[...] = src[...]

    def _dma(i, slot):
        return pltpu.make_async_copy(
            refs_stage[i],
            refs_out_saved[i].at[slot, :, :, :, :, :, pl.ds(blk * LANE, LANE)],
            sem.at[i],
        )

    def wait_saves(prev_slot):
        for i in range(n_out):
            _dma(i, prev_slot).wait()

    def save(slot):
        for stg, y in zip(refs_stage, refs_y_saved):
            stg[...] = y[...].astype(stg.dtype)
        for i in range(n_out):
            _dma(i, slot).start()

    save(0)

    def body(step, _):
        t = step * dt
        # RK4: k1 (src refs are indexed slice-wise inside rhs, keeping
        # VMEM temporaries small)
        rhs(refs_k, refs_y, t)
        for ac, k in zip(refs_ac, refs_k):
            ac[...] = k[...]
        for st, y, k in zip(refs_st, refs_y, refs_k):
            st[...] = y[...] + (0.5 * dt) * k[...]
        # k2
        rhs(refs_k, refs_st, t + 0.5 * dt)
        for ac, k in zip(refs_ac, refs_k):
            ac[...] = ac[...] + 2.0 * k[...]
        for st, y, k in zip(refs_st, refs_y, refs_k):
            st[...] = y[...] + (0.5 * dt) * k[...]
        # k3
        rhs(refs_k, refs_st, t + 0.5 * dt)
        for ac, k in zip(refs_ac, refs_k):
            ac[...] = ac[...] + 2.0 * k[...]
        for st, y, k in zip(refs_st, refs_y, refs_k):
            st[...] = y[...] + dt * k[...]
        # k4
        rhs(refs_k, refs_st, t + dt)
        for ac, k in zip(refs_ac, refs_k):
            ac[...] = ac[...] + k[...]
        for y, ac in zip(refs_y, refs_ac):
            y[...] = y[...] + (dt / 6.0) * ac[...]

        @pl.when((step + 1) % save_stride == 0)
        def _():
            slot = (step + 1) // save_stride
            # drain the previous save's DMAs (issued a full save_stride of
            # RK steps ago -- normally long complete) before re-staging
            wait_saves(slot - 1)
            save(slot)

        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)
    wait_saves(n_steps // save_stride)


class _StaticParams:
    """Hashable namespace of host-fetched SEIP parameters."""

    _FIELDS = (
        "beta", "sigma", "gamma", "contact", "pop", "season_amp",
        "season_peak", "intro_time", "intro_scale", "intro_perc",
        "intro_age_mask", "vax_knots", "vax_base_coeffs", "vax_knot_coeffs",
        "seasonal_vax_tau", "omega", "escape", "eta_to",
    )

    def __init__(self, **kw):
        for f in self._FIELDS:
            setattr(self, f, kw[f])

    def _key(self):
        return tuple(getattr(self, f) for f in self._FIELDS)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _StaticParams) and self._key() == other._key()


def _static_params(p) -> Tuple[_StaticParams, Tuple[int, ...], bool]:
    """Host-fetch a SEIPParams pytree into the kernel's static namespace."""
    L, J = np.asarray(jax.device_get(p.chi)).shape
    A = np.asarray(jax.device_get(p.pop)).shape[0]
    K = np.asarray(jax.device_get(p.vax_eff)).shape[1]
    M = np.asarray(jax.device_get(p.omega)).shape[0]

    chi = np.asarray(jax.device_get(p.chi))
    vax_eff = np.asarray(jax.device_get(p.vax_eff))
    base_prot = np.asarray(jax.device_get(p.base_protection))
    min_hom = float(jax.device_get(p.min_homologous))
    hist_mask = np.asarray(jax.device_get(p.hist_mask))
    # layered immunity -> susceptibility multiplier (models/seip.py:126-133)
    ii = 1.0 - (1.0 - chi[:, :, None]) * (1.0 - vax_eff[:, None, :])
    wib = ii[..., None] * base_prot  # (L,J,K,M)
    fi = (min_hom * hist_mask)[:, :, None, None]
    escape = 1.0 - (wib + (1.0 - wib) * fi)

    eta = np.asarray(jax.device_get(p.eta_onehot))  # (J,L,J)
    # the kernel routes recovery with static target indices; that is only
    # equivalent to the model's one-hot contraction when eta is STRICTLY
    # one-hot (it is for the bitwise-OR transition, ode_model.md:100-118)
    if not (
        np.all(np.isin(eta, (0.0, 1.0)))
        and np.all(eta.sum(axis=-1) == 1.0)
    ):
        raise ValueError(
            "seip_pallas requires a strictly one-hot eta_onehot transition"
        )
    eta_to = tuple(
        tuple(int(np.argmax(eta[j, l])) for l in range(L)) for j in range(J)
    )

    P = _StaticParams(
        beta=_np_tuple(p.beta),
        sigma=_np_tuple(p.sigma),
        gamma=_np_tuple(p.gamma),
        contact=_np_tuple(p.contact),
        pop=_np_tuple(p.pop),
        season_amp=float(jax.device_get(p.season_amp)),
        season_peak=float(jax.device_get(p.season_peak)),
        intro_time=_np_tuple(p.intro_time),
        intro_scale=_np_tuple(p.intro_scale),
        intro_perc=_np_tuple(p.intro_perc),
        intro_age_mask=_np_tuple(p.intro_age_mask),
        vax_knots=_np_tuple(p.vax_knots),
        vax_base_coeffs=_np_tuple(p.vax_base_coeffs),
        vax_knot_coeffs=_np_tuple(p.vax_knot_coeffs),
        seasonal_vax_tau=float(jax.device_get(p.seasonal_vax_tau)),
        omega=_np_tuple(p.omega),
        escape=_np_tuple(escape),
        eta_to=eta_to,
    )
    return P, (A, J, K, M, L), bool(p.seasonal_vaccination)


@functools.partial(
    jax.jit,
    static_argnames=(
        "P", "dims", "seasonal", "duration", "dt", "save_every", "save_mask",
        "save_dtype",
    ),
)
def _solve(
    y0_packed, scales_packed, *, P, dims, seasonal, duration, dt, save_every,
    save_mask, save_dtype=jnp.float32,
):
    A, J, K, M, L = dims
    n_steps = int(round(duration / dt))
    save_stride = int(round(save_every / dt))
    n_saves = n_steps // save_stride + 1
    s0, e0, i0, c0 = y0_packed
    nl = scales_packed.shape[-1]
    save_dtype = jnp.dtype(save_dtype)  # accepts the hashable name string

    shape_S = (A, J, K, M, SUB, LANE)
    shape_E = (A, J, K, L, SUB, LANE)
    comp_shapes = (shape_S, shape_E, shape_E, shape_E)
    saved_shapes = [s for s, m in zip(comp_shapes, save_mask) if m]
    out_shapes = [
        jax.ShapeDtypeStruct((n_saves,) + s[:-1] + (nl,), save_dtype)
        for s in saved_shapes
    ]
    kernel = functools.partial(
        _seip_kernel,
        P=P,
        dims=dims,
        dt=dt,
        n_steps=n_steps,
        save_stride=save_stride,
        seasonal=seasonal,
        save_mask=save_mask,
    )
    grid = (nl // LANE,)
    const_spec = [
        pl.BlockSpec(
            s, lambda i, n=len(s): (0,) * n, memory_space=pltpu.VMEM
        )
        for s in comp_shapes
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=const_spec
        + [
            pl.BlockSpec(
                (L, SUB, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shapes),
        scratch_shapes=[
            pltpu.VMEM(shape_S, jnp.float32),
            pltpu.VMEM(shape_E, jnp.float32),
            pltpu.VMEM(shape_E, jnp.float32),
            pltpu.VMEM(shape_E, jnp.float32),
        ]
        * 4
        # save staging (one per saved compartment, in the save dtype): the
        # DMA source while the live state keeps stepping (pipelined saves)
        + [pltpu.VMEM(s, save_dtype) for s in saved_shapes]
        + [pltpu.SemaphoreType.DMA((len(saved_shapes),))],
    )(s0, e0, i0, c0, scales_packed)
    return outs


# ---------------------------------------------------------------------------
# the adaptive (lockstep-dt) kernel
# ---------------------------------------------------------------------------
#
# Bogacki-Shampine 3(2): 4 RHS evals per attempted step (same as RK4) with
# an embedded 2nd-order error estimate. Chosen over Tsit5 for the same VMEM
# reason RK4 was (module docstring): BS3 needs 5 live state groups
# (y, stage input, k, y_new accumulator, error accumulator) ~= 13.1 MB at
# 1024 members -- Tsit5's dense tableau needs 7+. To make room for the 5th
# group the initial state moves OUT of VMEM: y0 arrives in HBM (ANY memory
# space) and is DMA'd into the live state refs once at kernel start.
#
# dt is LOCKSTEP PER 1024-MEMBER BLOCK: each Pallas program carries one
# scalar (t, dt) chain; the controller norm is the MAX over the block of
# each member's scaled RMS error, so every member of the block satisfies
# the tolerance and the block's dt is set by its currently-stiffest member.
# This is the member-tile analog of the XLA save-grid engine
# (ode/integrate.py::_solve_adaptive_grid), whose per-member dt chains pay
# HBM traffic per stage; here the whole attempt stays VMEM-resident.
# Controller semantics mirror the grid engine: I-controller
# factor = clip(0.9 * norm^(-1/3), 0.2, 10), dt clamped to land EXACTLY on
# each save point, an accepted clamped step keeps the natural dt, a
# rejected one shrinks from the clamped size. Budget exhaustion (more than
# steps_per_save attempts in one save interval; the FIRST interval gets
# max(2x, 16) for the dt0 ramp) emits NaN saves from that point until the
# block catches up and is counted loudly in the returned stats -- the same
# contract as SolverParams.step_budget on the XLA engines.

_BS3_ERR_ORDER = 3.0


def _seip_kernel_adaptive(
    *refs,
    P,
    dims,
    n_saves: int,
    save_every: float,
    steps_per_save: int,
    rtol: float,
    atol: float,
    dt0: float,
    seasonal: bool,
    save_mask: Tuple[bool, bool, bool, bool],
):
    n_out = sum(save_mask)
    (s0_ref, e0_ref, i0_ref, c0_ref, scale_ref) = refs[:5]
    refs_out_saved = refs[5:5 + n_out]
    flag_ref = refs[5 + n_out]
    base = 6 + n_out
    (
        y_S, y_E, y_I, y_C,
        st_S, st_E, st_I, st_C,
        k_S, k_E, k_I, k_C,
        ac_S, ac_E, ac_I, ac_C,
        er_S, er_E, er_I, er_C,
    ) = refs[base:base + 20]
    refs_stage = refs[base + 20:base + 20 + n_out]
    sem = refs[base + 20 + n_out]
    sem_in = refs[base + 20 + n_out + 1]
    nrm_ref = refs[base + 20 + n_out + 2]
    blk = pl.program_id(0)

    scale = scale_ref[...]  # (L, 8, 128) per-strain per-member scales
    rhs = _build_rhs(
        P, dims, seasonal, [scale[l] for l in range(dims[-1])]
    )

    refs_y = (y_S, y_E, y_I, y_C)
    refs_st = (st_S, st_E, st_I, st_C)
    refs_k = (k_S, k_E, k_I, k_C)
    refs_ac = (ac_S, ac_E, ac_I, ac_C)
    refs_er = (er_S, er_E, er_I, er_C)
    refs_in = (s0_ref, e0_ref, i0_ref, c0_ref)
    refs_y_saved = tuple(y for y, m in zip(refs_y, save_mask) if m)

    n_elems = sum(
        int(np.prod(r.shape[:-2])) for r in refs_y
    )  # state elements per member (640 for the production config)
    eps = 1e-6 * max(float(save_every), 1.0)
    f32 = jnp.float32
    i32 = jnp.int32

    # ---- initial state: one startup DMA per compartment (HBM -> VMEM) ----
    for i, (src, dst) in enumerate(zip(refs_in, refs_y)):
        pltpu.make_async_copy(src, dst, sem_in.at[i]).start()
    for i, (src, dst) in enumerate(zip(refs_in, refs_y)):
        pltpu.make_async_copy(src, dst, sem_in.at[i]).wait()

    # ---- pipelined save DMAs (same scheme as the constant-step kernel) ---
    def _dma(i, slot):
        return pltpu.make_async_copy(
            refs_stage[i],
            refs_out_saved[i].at[slot, :, :, :, :, :, pl.ds(blk * LANE, LANE)],
            sem.at[i],
        )

    def wait_saves(prev_slot):
        for i in range(n_out):
            _dma(i, prev_slot).wait()

    def save(slot, reached):
        for stg, y in zip(refs_stage, refs_y_saved):
            v = y[...]
            stg[...] = jnp.where(
                reached, v, jnp.full_like(v, jnp.nan)
            ).astype(stg.dtype)
        for i in range(n_out):
            _dma(i, slot).start()

    def err_norm():
        """Max over the block's members of each member's scaled RMS error."""
        sq = None
        for er, y, ac in zip(refs_er, refs_y, refs_ac):
            for idx in np.ndindex(*er.shape[:-2]):
                e = er[idx]
                sc = atol + rtol * jnp.maximum(
                    jnp.abs(y[idx]), jnp.abs(ac[idx])
                )
                r = e / sc
                sq = r * r if sq is None else sq + r * r
        return jnp.max(jnp.sqrt(sq * (1.0 / n_elems)))

    def make_attempt(s_end):
        def attempt(_, carry):
            t, dt_next, kv, na, nr = carry
            remaining = s_end - t
            active = remaining > eps
            dt_used = jnp.minimum(dt_next, remaining)
            landing = dt_used >= remaining - eps

            # FSAL (round 5): after an ACCEPT, refs_k still holds k4 =
            # f(t_new, y_new) -- exactly this attempt's k1 -- so no 6th
            # VMEM group is needed; ``kv`` tracks whether refs_k is that
            # valid first stage (an accepted predecessor) or stale (a
            # rejection overwrote it with the rejected candidate's k4,
            # or this is the first attempt of the solve).
            @pl.when(active & (kv == 0))
            def _():
                rhs(refs_k, refs_y, t)  # k1 recompute only when stale

            @pl.when(active)
            def _():
                # k1 is in refs_k (reused via FSAL or just recomputed)
                for ac, y, k in zip(refs_ac, refs_y, refs_k):
                    ac[...] = y[...] + (dt_used * (2.0 / 9.0)) * k[...]
                for er, k in zip(refs_er, refs_k):
                    er[...] = (dt_used * (5.0 / 72.0)) * k[...]
                for st, y, k in zip(refs_st, refs_y, refs_k):
                    st[...] = y[...] + (0.5 * dt_used) * k[...]
                # k2
                rhs(refs_k, refs_st, t + 0.5 * dt_used)
                for ac, k in zip(refs_ac, refs_k):
                    ac[...] = ac[...] + (dt_used / 3.0) * k[...]
                for er, k in zip(refs_er, refs_k):
                    er[...] = er[...] - (dt_used / 12.0) * k[...]
                for st, y, k in zip(refs_st, refs_y, refs_k):
                    st[...] = y[...] + (0.75 * dt_used) * k[...]
                # k3
                rhs(refs_k, refs_st, t + 0.75 * dt_used)
                for ac, k in zip(refs_ac, refs_k):
                    ac[...] = ac[...] + (dt_used * (4.0 / 9.0)) * k[...]
                for er, k in zip(refs_er, refs_k):
                    er[...] = er[...] - (dt_used / 9.0) * k[...]
                # k4 = f(t+dt, y_new): the embedded 2nd-order estimate's
                # extra stage (BS3's FSAL stage; on accept it IS the next
                # attempt's k1 -- see the kv carry above)
                rhs(refs_k, refs_ac, t + dt_used)
                for er, k in zip(refs_er, refs_k):
                    er[...] = er[...] + (dt_used / 8.0) * k[...]
                nrm_ref[0] = err_norm()

            norm = nrm_ref[0]
            ok = jnp.isfinite(norm)
            safe = jnp.maximum(norm, jnp.asarray(1e-30, f32))
            # norm**(-1/3) via exp/log: Mosaic has no scalar powf lowering
            factor = jnp.clip(
                0.9 * jnp.exp(jnp.log(safe) * (-1.0 / _BS3_ERR_ORDER)),
                0.2,
                10.0,
            )
            factor = jnp.where(ok, factor, jnp.asarray(0.2, f32))
            good = ok & (norm <= 1.0)
            acc = active & good
            # an ACCEPTED save-clamped step says nothing about the natural
            # dt (it was artificially short): keep dt_next; a REJECTED one
            # must shrink from the clamped size (grid-engine semantics)
            dt_new = jnp.where(landing & good, dt_next, dt_used * factor)
            dt_new = jnp.where(active, dt_new, dt_next)

            @pl.when(acc)
            def _():
                for y, a in zip(refs_y, refs_ac):
                    y[...] = a[...]

            t_new = jnp.where(
                acc, jnp.where(landing, s_end, t + dt_used), t
            )
            # refs_k validity for the NEXT attempt: an accepted active
            # attempt leaves k4 = f(t_new, y_new) in refs_k; a rejected
            # one poisons it; inactive iterations touch nothing
            kv = jnp.where(active, acc.astype(i32), kv)
            na = na + acc.astype(i32)
            nr = nr + (active & ~acc).astype(i32)
            return (t_new, dt_new, kv, na, nr)

        return attempt

    def run_interval(carry, s_end, k_attempts):
        t, dt, kv, na, nr, bad = carry
        t, dt, kv, na, nr = jax.lax.fori_loop(
            0, k_attempts, make_attempt(s_end), (t, dt, kv, na, nr)
        )
        reached = t >= s_end - eps
        bad = bad + (~reached).astype(i32)
        return (t, dt, kv, na, nr, bad), reached

    save(0, jnp.asarray(True))

    carry = (
        jnp.asarray(0.0, f32),
        jnp.asarray(dt0, f32),
        jnp.zeros((), i32),  # kv: refs_k does not yet hold f(t0, y0)
        jnp.zeros((), i32),
        jnp.zeros((), i32),
        jnp.zeros((), i32),
    )
    # first interval ramps dt up from the heuristic dt0 (no Hairer-Wanner
    # auto-init in-kernel) AND covers the initial epidemic transient, so it
    # gets a 4x budget (measured: rtol=1e-5 takes ~17 attempts for day one
    # vs ~3 steady-state; the grid engine's auto-dt0 only needs 2x)
    k_first = max(4 * steps_per_save, 32)
    carry, reached1 = run_interval(carry, jnp.asarray(save_every, f32), k_first)
    wait_saves(0)
    save(1, reached1)

    def outer(s, carry):
        s_end = s.astype(f32) * save_every
        carry, reached = run_interval(carry, s_end, steps_per_save)
        wait_saves(s - 1)
        save(s, reached)
        return carry

    carry = jax.lax.fori_loop(2, n_saves, outer, carry)
    wait_saves(n_saves - 1)

    _, _, _, na, nr, bad = carry
    col = jax.lax.broadcasted_iota(i32, (SUB, LANE), 1)
    flag_ref[0] = jnp.where(
        col == 0, bad, jnp.where(col == 1, na, jnp.where(col == 2, nr, 0))
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "P", "dims", "seasonal", "duration", "save_every", "rtol", "atol",
        "dt0", "steps_per_save", "save_mask", "save_dtype",
    ),
)
def _solve_adaptive(
    y0_packed, scales_packed, *, P, dims, seasonal, duration, save_every,
    rtol, atol, dt0, steps_per_save, save_mask, save_dtype=jnp.float32,
):
    A, J, K, M, L = dims
    n_saves = int(round(duration / save_every)) + 1
    s0, e0, i0, c0 = y0_packed
    nl = scales_packed.shape[-1]
    nb = nl // LANE
    save_dtype = jnp.dtype(save_dtype)

    shape_S = (A, J, K, M, SUB, LANE)
    shape_E = (A, J, K, L, SUB, LANE)
    comp_shapes = (shape_S, shape_E, shape_E, shape_E)
    saved_shapes = [s for s, m in zip(comp_shapes, save_mask) if m]
    out_shapes = [
        jax.ShapeDtypeStruct((n_saves,) + s[:-1] + (nl,), save_dtype)
        for s in saved_shapes
    ] + [jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.int32)]
    kernel = functools.partial(
        _seip_kernel_adaptive,
        P=P,
        dims=dims,
        n_saves=n_saves,
        save_every=save_every,
        steps_per_save=steps_per_save,
        rtol=rtol,
        atol=atol,
        dt0=dt0,
        seasonal=seasonal,
        save_mask=save_mask,
    )
    grid = (nb,)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [
            pl.BlockSpec(
                (L, SUB, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(saved_shapes)
        + [
            pl.BlockSpec(
                (1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=[
            pltpu.VMEM(shape_S, jnp.float32),
            pltpu.VMEM(shape_E, jnp.float32),
            pltpu.VMEM(shape_E, jnp.float32),
            pltpu.VMEM(shape_E, jnp.float32),
        ]
        * 5
        + [pltpu.VMEM(s, save_dtype) for s in saved_shapes]
        + [
            pltpu.SemaphoreType.DMA((len(saved_shapes),)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SMEM((1,), jnp.float32),
        ],
    )(s0, e0, i0, c0, scales_packed)
    return outs[:-1], outs[-1]


def seip_ensemble_solve_adaptive(
    y0,
    params,
    beta_scales,
    *,
    duration: float,
    save_every: float = 1.0,
    rtol: float = 1e-4,
    atol: float = 1e-3,
    dt0: float = None,
    steps_per_save: int = 8,
    save: Tuple[int, ...] = (0, 1, 2, 3),
    save_dtype=jnp.float32,
    packed: bool = False,
):
    """Adaptive (lockstep-dt) whole-solve-in-VMEM SEIP ensemble.

    The adaptive analog of :func:`seip_ensemble_solve` -- Bogacki-Shampine
    3(2) with an I-controller (the reference's DEFAULT solve mode is
    adaptive: /root/reference/src/dynode/config/params.py:36-47), dt shared
    across each 1024-member block and driven by the block's max per-member
    scaled RMS error, clamped to land exactly on each save point (see the
    kernel comment above ``_seip_kernel_adaptive`` for the full contract).

    ``atol`` defaults to 1e-3 -- the f32-scaled value for ~1e3-scale
    compartment populations (CLAUDE.md: f64-calibrated defaults make the
    controller thrash on-chip).

    Returns ``(outs, stats)``: ``outs`` as in :func:`seip_ensemble_solve`;
    ``stats`` has per-block int32 arrays ``exhausted_intervals`` (save
    intervals whose attempt budget ran out -- their saves are NaN; nonzero
    means raise ``steps_per_save``), ``n_accepted``, ``n_rejected``.
    Off-TPU falls back to :func:`seip_solve_adaptive_reference` (one global
    lockstep block).
    """
    save = tuple(sorted(set(int(i) for i in save)))
    assert save and all(0 <= i < 4 for i in save), save
    B = int(beta_scales.shape[-1])
    n_saves = int(round(duration / save_every)) + 1
    if abs((n_saves - 1) * save_every - duration) > 1e-6 * max(duration, 1.0):
        raise ValueError("duration must be a multiple of save_every")
    if dt0 is None:
        dt0 = save_every / 8.0
    if jax.default_backend() not in ("tpu",):
        outs, stats = seip_solve_adaptive_reference(
            y0, params, beta_scales, duration=duration,
            save_every=save_every, rtol=rtol, atol=atol, dt0=dt0,
            steps_per_save=steps_per_save,
        )
        outs = tuple(outs[i].astype(save_dtype) for i in save)
        return (
            tuple(pack_members(o) for o in outs) if packed else outs
        ), stats
    assert B % BLOCK == 0, f"batch must be a multiple of {BLOCK}"
    P, dims, seasonal = _static_params(params)
    y0_packed = tuple(
        pack_members(
            jnp.broadcast_to(
                jnp.asarray(c, jnp.float32)[..., None], c.shape + (BLOCK,)
            )
        )
        for c in y0
    )
    scales_packed = pack_members(
        _norm_scales(beta_scales, dims[-1], jnp.float32)
    )
    outs, flags = _solve_adaptive(
        y0_packed,
        scales_packed,
        P=P,
        dims=dims,
        seasonal=seasonal,
        duration=float(duration),
        save_every=float(save_every),
        rtol=float(rtol),
        atol=float(atol),
        dt0=float(dt0),
        steps_per_save=int(steps_per_save),
        save_mask=tuple(i in save for i in range(4)),
        save_dtype=jnp.dtype(save_dtype).name,
    )
    stats = {
        "exhausted_intervals": flags[:, 0, 0],
        "n_accepted": flags[:, 0, 1],
        "n_rejected": flags[:, 0, 2],
    }
    if packed:
        return tuple(outs), stats
    return tuple(unpack_members(o) for o in outs), stats


def seip_solve_adaptive_reference(
    y0, params, beta_scales, *, duration, save_every=1.0, rtol=1e-4,
    atol=1e-3, dt0=None, steps_per_save=8,
):
    """Pure-JAX lockstep BS3(2) reference (one global block) + CPU fallback.

    Same algorithm as ``_seip_kernel_adaptive`` -- shared scalar dt over the
    WHOLE ensemble, max-of-member-RMS controller norm, save-point clamping,
    per-interval attempt budgets -- expressed on the lane-major ensemble RHS
    (``seip_ode_ensemble``). Decisions can differ from the kernel's at the
    float level (different reduction orders), so equivalence tests compare
    both against a dense-grid oracle at the tolerance scale rather than
    member-for-member. Returns ``(outs, stats)`` with all 4 compartments.
    """
    from ..models.seip import (
        seip_ensemble_params,
        seip_ensemble_state,
        seip_ode_ensemble,
    )

    B = int(beta_scales.shape[-1])
    fdt = jnp.result_type(float)
    p = seip_ensemble_params(params, jnp.asarray(beta_scales, fdt))
    y0e = seip_ensemble_state(tuple(jnp.asarray(c, fdt) for c in y0), B)
    n_saves = int(round(duration / save_every)) + 1
    k = int(steps_per_save)
    k_first = max(4 * k, 32)  # matches _seip_kernel_adaptive's ramp budget
    dt0 = float(save_every / 8.0 if dt0 is None else dt0)
    eps = 1e-6 * max(float(save_every), 1.0)
    n_elems = sum(int(np.prod(c.shape[:-1])) for c in y0e)
    n_ax = len(y0e[0].shape) - 1

    def rhs(t, y):
        return seip_ode_ensemble(t, y, p)

    def tsel(pred, a, b):
        return jax.tree_util.tree_map(
            lambda x, z: jnp.where(pred, x, z), a, b
        )

    def attempt(_, carry):
        t, dt_next, y, na, nr, s_end = carry
        remaining = s_end - t
        active = remaining > eps
        dt = jnp.minimum(dt_next, remaining)
        landing = dt >= remaining - eps
        k1 = rhs(t, y)
        y2 = tuple(a + (0.5 * dt) * b for a, b in zip(y, k1))
        k2 = rhs(t + 0.5 * dt, y2)
        y3 = tuple(a + (0.75 * dt) * b for a, b in zip(y, k2))
        k3 = rhs(t + 0.75 * dt, y3)
        ynew = tuple(
            a + dt * ((2.0 / 9.0) * b1 + (1.0 / 3.0) * b2 + (4.0 / 9.0) * b3)
            for a, b1, b2, b3 in zip(y, k1, k2, k3)
        )
        k4 = rhs(t + dt, ynew)
        sq = jnp.zeros((B,), fdt)
        for a, b1, b2, b3, b4, yn in zip(y, k1, k2, k3, k4, ynew):
            e = dt * (
                (5.0 / 72.0) * b1
                - (1.0 / 12.0) * b2
                - (1.0 / 9.0) * b3
                + (1.0 / 8.0) * b4
            )
            sc = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(yn))
            r = e / sc
            sq = sq + jnp.sum(r * r, axis=tuple(range(n_ax)))
        norm = jnp.max(jnp.sqrt(sq / n_elems))
        ok = jnp.isfinite(norm)
        safe = jnp.maximum(norm, jnp.asarray(1e-30, fdt))
        factor = jnp.clip(0.9 * safe ** (-1.0 / _BS3_ERR_ORDER), 0.2, 10.0)
        factor = jnp.where(ok, factor, jnp.asarray(0.2, fdt))
        good = ok & (norm <= 1.0)
        acc = active & good
        dt_new = jnp.where(landing & good, dt_next, dt * factor)
        dt_new = jnp.where(active, dt_new, dt_next)
        y = tsel(acc, ynew, y)
        t = jnp.where(acc, jnp.where(landing, s_end, t + dt), t)
        na = na + acc.astype(jnp.int32)
        nr = nr + (active & ~acc).astype(jnp.int32)
        return (t, dt_new, y, na, nr, s_end)

    @jax.jit
    def solve():
        zero = jnp.zeros((), jnp.int32)

        def interval(carry, s_end, kk):
            t, dt, y, na, nr, bad = carry
            t, dt, y, na, nr, _ = jax.lax.fori_loop(
                0, kk, attempt, (t, dt, y, na, nr, s_end)
            )
            reached = t >= s_end - eps
            bad = bad + (~reached).astype(jnp.int32)
            emit = jax.tree_util.tree_map(
                lambda leaf: jnp.where(
                    reached, leaf, jnp.full_like(leaf, jnp.nan)
                ),
                y,
            )
            return (t, dt, y, na, nr, bad), emit

        carry = (
            jnp.asarray(0.0, fdt), jnp.asarray(dt0, fdt), y0e, zero, zero,
            zero,
        )
        carry, emit1 = interval(carry, jnp.asarray(save_every, fdt), k_first)

        def scan_body(c, s_end):
            return interval(c, s_end, k)

        s_ends = jnp.arange(2, n_saves, dtype=fdt) * save_every
        carry, emits = jax.lax.scan(scan_body, carry, s_ends)
        outs = tuple(
            jnp.concatenate([c0[None], e1[None], es], axis=0)
            for c0, e1, es in zip(y0e, emit1, emits)
        )
        _, _, _, na, nr, bad = carry
        return outs, bad[None], na[None], nr[None]

    outs, bad, na, nr = solve()
    stats = {
        "exhausted_intervals": bad,
        "n_accepted": na,
        "n_rejected": nr,
    }
    return outs, stats


def seip_ensemble_solve(
    y0,
    params,
    beta_scales,
    *,
    duration: float,
    dt: float = 0.5,
    save_every: float = 1.0,
    save: Tuple[int, ...] = (0, 1, 2, 3),
    save_dtype=jnp.float32,
    packed: bool = False,
):
    """Solve a B-wide SEIP ensemble fully inside one Pallas kernel.

    ``beta_scales``: per-member transmission scaling (B a multiple of
    1024) -- ``(B,)`` applies one scale to every strain; ``(L, B)`` scales
    each strain independently (the shape of the production fit's posterior
    draws -- posterior-predictive forecasting feeds those straight in,
    examples/seip_forecast.py). Returns lane-major saves for the
    compartments in ``save`` (ascending indices into (S, E, I, C)), each
    shaped ``(T, *compartment_shape, B)``. Restricting ``save`` matters at width:
    the output buffer is the kernel's ONLY HBM traffic (full-4 daily f32
    saves are ~7.9 GiB at B=16384; ``save=(3,)`` cuts it 5x). Base
    parameters are host-fetched and compiled in (see module docstring).
    Falls back to :func:`seip_solve_reference` off-TPU.

    ``save_dtype=jnp.bfloat16`` halves the output buffer (state math stays
    exact f32 in VMEM; only the materialized saves are rounded to bf16's
    ~3e-3 relative grid) -- for ensemble-summary workloads where the extra
    width matters more than save precision.

    ``packed=True`` returns the kernel's native member-tile layout
    ``(T, *compartment_shape, 8, B // 8)`` WITHOUT relayouting to
    member-last. The relayout is a full copy of every output -- a 2x HBM
    peak that is exactly what used to OOM full-compartment saves at
    B >= 16k. The member axis is a fixed bijection (``unpack_members``
    restores it, sliceable per compartment/time so the peak never
    materializes), and member-permutation-invariant reductions (ensemble
    means, quantiles, histograms) can consume the packed layout directly.
    """
    save = tuple(sorted(set(int(i) for i in save)))
    assert save and all(0 <= i < 4 for i in save), save
    B = int(beta_scales.shape[-1])
    if jax.default_backend() not in ("tpu",):
        outs = seip_solve_reference(
            y0, params, beta_scales, duration=duration, dt=dt,
            save_every=save_every,
        )
        outs = tuple(outs[i].astype(save_dtype) for i in save)
        return tuple(pack_members(o) for o in outs) if packed else outs
    assert B % BLOCK == 0, f"batch must be a multiple of {BLOCK}"
    P, dims, seasonal = _static_params(params)
    y0_packed = tuple(
        pack_members(
            jnp.broadcast_to(
                jnp.asarray(c, jnp.float32)[..., None], c.shape + (B,)
            )
        )
        for c in y0
    )
    scales_packed = pack_members(
        _norm_scales(beta_scales, dims[-1], jnp.float32)
    )
    outs = _solve(
        y0_packed,
        scales_packed,
        P=P,
        dims=dims,
        seasonal=seasonal,
        duration=float(duration),
        dt=float(dt),
        save_every=float(save_every),
        save_mask=tuple(i in save for i in range(4)),
        save_dtype=jnp.dtype(save_dtype).name,
    )
    if packed:
        return tuple(outs)
    return tuple(unpack_members(o) for o in outs)


def seip_solve_reference(
    y0, params, beta_scales, *, duration, dt=0.5, save_every=1.0
):
    """RK4 lax.scan reference with identical stage math (batch-leading),
    for correctness diffing and CPU fallback. ``beta_scales`` is (B,) or
    (L, B) as in :func:`seip_ensemble_solve`. Returns lane-major saves."""
    from ..models.seip import seip_ode

    n_steps = int(round(duration / dt))
    stride = int(round(save_every / dt))

    def solve_one(scale):
        # scale: () shared or (L,) per-strain -- both broadcast into beta
        p = params.replace(beta=params.beta * scale)

        def rk4(y, t):
            k1 = seip_ode(t, y, p)
            y2 = tuple(a + 0.5 * dt * b for a, b in zip(y, k1))
            k2 = seip_ode(t + 0.5 * dt, y2, p)
            y3 = tuple(a + 0.5 * dt * b for a, b in zip(y, k2))
            k3 = seip_ode(t + 0.5 * dt, y3, p)
            y4 = tuple(a + dt * b for a, b in zip(y, k3))
            k4 = seip_ode(t + dt, y4, p)
            return tuple(
                a + (dt / 6.0) * (b1 + 2 * b2 + 2 * b3 + b4)
                for a, b1, b2, b3, b4 in zip(y, k1, k2, k3, k4)
            )

        def outer(y, i):
            def inner(yy, j):
                t = (i * stride + j) * dt
                return rk4(yy, t), None

            y, _ = jax.lax.scan(inner, y, jnp.arange(stride))
            return y, y

        fdt = jnp.result_type(float)  # f64 under x64 (CPU tests), else f32
        y0f = tuple(jnp.asarray(c, fdt) for c in y0)
        _, saves = jax.lax.scan(
            outer, y0f, jnp.arange(n_steps // stride)
        )
        return tuple(
            jnp.concatenate([c[None], s], axis=0) for c, s in zip(y0f, saves)
        )

    scales = jnp.asarray(beta_scales, jnp.result_type(float))
    # member axis is the LAST axis in both accepted shapes
    outs = jax.jit(
        jax.vmap(solve_one, in_axes=-1, out_axes=tuple([-1] * 4))
    )(scales)
    return outs


__all__ = [
    "seip_ensemble_solve",
    "seip_ensemble_solve_adaptive",
    "seip_solve_reference",
    "seip_solve_adaptive_reference",
    "pack_members",
    "unpack_members",
    "BLOCK",
]
