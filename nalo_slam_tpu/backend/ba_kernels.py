"""Device kernels for the sliding-window photometric bundle adjustment.

This replaces the reference's residual linearization + SSE accumulator
stack (src/FullSystem/Residuals.cpp, src/OptimizationBackend/
AccumulatedTopHessian.cpp, AccumulatedSCHessian.cpp, MatrixAccumulators.h)
with fixed-shape batched JAX:

* Residual slots are a dense (P, F) grid: point p vs target frame f, with
  existence/state masks -- point birth/death never changes shapes.
* linearize_residuals: one vmapped pass computes, per active slot, the
  full RawResidualJacobian (geometry Jacobians at the FIRST-ESTIMATE pose
  and idepth_zero, pattern residuals at the current pose/idepth -- exactly
  Residuals.cpp:78-274) plus the pattern inner products.
* accumulate_top: per (host,target) pair, sums the 13x13 [c(4) xi(6) ab(2)
  r(1)] outer-product system via einsum + segment_sum (mode 0 active /
  mode 1 FEJ-shifted / mode 2 marginalize, AccumulatedTopHessian.cpp:39-162).
* accumulate_sc: the Schur quantities per point and residual pair
  (AccumulatedSCHessian.cpp:34-77).
* resubstitute: idepth steps from the frame/calib increment
  (EnergyFunctional.cpp:263-317).

All Jacobians are in REAL parameter units; the reference's SCALE_* diagonal
rescaling cancels in its own solves and is applied here only where priors
are specified in scaled units (see energy.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import PATTERN
from ..ops.interp import build_quad, interp3, interp3q

# residual states
RES_IN = 0
RES_OOB = 1
RES_OUTLIER = 2


@partial(jax.jit, static_argnames=("pattern_num",))
def linearize_residuals(
    # images
    target_dI,            # (F, H, W, 3) level-0 stacks of all window frames
    # per-point
    p_u, p_v,             # (P,)
    p_idepth, p_idepth_zero,  # (P,) current and FEJ inverse depth
    p_color, p_weights,   # (P, 8)
    p_host,               # (P,) int32 host frame slot
    p_energy_th,          # (P,) point energyTH (outlier gate per pattern)
    # per-residual
    r_exists, r_state,    # (P, F) bool / int32
    # per-pair precalc (FEJ pose, current pose, affine)
    PRE_R0, PRE_t0,       # (F, F, 3, 3), (F, F, 3)   host->target at evalPT
    PRE_KRKi, PRE_Kt,     # (F, F, 3, 3), (F, F, 3)   current, K-conjugated
    PRE_aff,              # (F, F, 2)  (a, b) host->target current
    PRE_b0,               # (F,) host aff_g2l_0().b
    # frame energy thresholds
    f_energy_th,          # (F,)
    calib,                # (4,) fx fy cx cy
    outlier_th_sum,       # scalar setting_outlierTHSumComponent
    huber_th,             # scalar
    ab_zero,              # (2,) 0/1 multipliers: zero JabF when affine fixed
    pattern_num: int = 8,
    target_quad=None,     # (F, H*W, 12) prebuilt quad-tap tables; callers
                          # whose linearize sits inside a device loop MUST
                          # pass this (ops.interp.build_quad hoisting note)
    f_energy_th_target=None,  # per-target-column energy thresholds when the
                          # target axis is a SLICE of the window (the fused
                          # GN tail relinearizes only the newest column);
                          # f_energy_th stays full F for the host-side lookup
):
    """Returns a dict of per-(P,F) Jacobian fields, energies and new states."""
    fx, fy, cx, cy = calib[0], calib[1], calib[2], calib[3]
    F, H, W, _ = target_dI.shape
    P = p_u.shape[0]
    pat = jnp.asarray(PATTERN, jnp.float32)

    hostR0 = PRE_R0[p_host]     # (P, F, 3, 3)
    hostT0 = PRE_t0[p_host]
    hostKRKi = PRE_KRKi[p_host]
    hostKt = PRE_Kt[p_host]
    hostAff = PRE_aff[p_host]   # (P, F, 2)
    b0 = PRE_b0[p_host]         # (P,)

    # ---- center projection at FEJ (reference :100-106) ----
    KliP = jnp.stack(
        [(p_u - cx) / fx, (p_v - cy) / fy, jnp.ones_like(p_u)], axis=-1
    )  # (P, 3)
    ptp0 = (
        jnp.einsum("pfij,pj->pfi", hostR0, KliP, precision="highest")
        + hostT0 * p_idepth_zero[:, None, None]
    )  # (P, F, 3)
    drescale = 1.0 / ptp0[..., 2]
    new_idepth = p_idepth_zero[:, None] * drescale
    u0 = ptp0[..., 0] * drescale
    v0 = ptp0[..., 1] * drescale
    Ku0 = u0 * fx + cx
    Kv0 = v0 * fy + cy
    center_ok = (
        (drescale > 0)
        & (Ku0 > 1.1) & (Kv0 > 1.1) & (Ku0 < W - 3) & (Kv0 < H - 3)
    )

    # idepth derivative (with SCALE_IDEPTH == 1)
    d_d_x = drescale * (hostT0[..., 0] - hostT0[..., 2] * u0) * fx
    d_d_y = drescale * (hostT0[..., 1] - hostT0[..., 2] * v0) * fy

    # calib derivatives (reference :118-139, real units)
    R0 = hostR0
    dCx2 = drescale * (R0[..., 2, 0] * u0 - R0[..., 0, 0])
    dCx3 = fx * drescale * (R0[..., 2, 1] * u0 - R0[..., 0, 1]) / fy
    dCx0 = KliP[:, None, 0] * dCx2
    dCx1 = KliP[:, None, 1] * dCx3
    dCy2 = fy * drescale * (R0[..., 2, 0] * v0 - R0[..., 1, 0]) / fx
    dCy3 = drescale * (R0[..., 2, 1] * v0 - R0[..., 1, 1])
    dCy0 = KliP[:, None, 0] * dCy2
    dCy1 = KliP[:, None, 1] * dCy3
    Jpdc = jnp.stack(
        [
            jnp.stack([dCx0 + u0, dCx1, dCx2 + 1.0, dCx3], axis=-1),
            jnp.stack([dCy0, dCy1 + v0, dCy2, dCy3 + 1.0], axis=-1),
        ],
        axis=-2,
    )  # (P, F, 2, 4)

    # pose derivatives (reference :142-156)
    Jpdxi = jnp.stack(
        [
            jnp.stack(
                [
                    new_idepth * fx,
                    jnp.zeros_like(u0),
                    -new_idepth * u0 * fx,
                    -u0 * v0 * fx,
                    (1.0 + u0 * u0) * fx,
                    -v0 * fx,
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    jnp.zeros_like(u0),
                    new_idepth * fy,
                    -new_idepth * v0 * fy,
                    -(1.0 + v0 * v0) * fy,
                    u0 * v0 * fy,
                    u0 * fy,
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )  # (P, F, 2, 6)
    Jpdd = jnp.stack([d_d_x, d_d_y], axis=-1)  # (P, F, 2)

    # ---- pattern residuals at CURRENT state (reference :183-245) ----
    up = p_u[:, None] + pat[None, :, 0]     # (P, 8)
    vp = p_v[:, None] + pat[None, :, 1]
    pt = (
        jnp.einsum("pfij,pkj->pfki", hostKRKi,
                   jnp.stack([up, vp, jnp.ones_like(up)], axis=-1),
                   precision="highest")
        + hostKt[:, :, None, :] * p_idepth[:, None, None, None]
    )  # (P, F, 8, 3)
    Ku = pt[..., 0] / pt[..., 2]
    Kv = pt[..., 1] / pt[..., 2]
    pat_ok = (Ku > 1.1) & (Kv > 1.1) & (Ku < W - 3) & (Kv < H - 3)

    # gather from each target frame: vmap interp over F
    if target_quad is None:
        target_quad = jax.vmap(build_quad)(target_dI)
    hit = jax.vmap(lambda q, Ku_f, Kv_f: interp3q(q, H, W, Ku_f, Kv_f),
                   in_axes=(0, 1, 1), out_axes=1)(
        target_quad, Ku, Kv
    )  # (P, F, 8, 3)
    finite = jnp.isfinite(hit[..., 0])
    all_ok = jnp.all(pat_ok & finite, axis=-1) & center_ok  # (P, F)

    a_ll = hostAff[..., 0]
    b_ll = hostAff[..., 1]
    residual = hit[..., 0] - (a_ll[..., None] * p_color[:, None, :] + b_ll[..., None])
    drdA = p_color[:, None, :] - b0[:, None, None]

    grad2 = hit[..., 1] ** 2 + hit[..., 2] ** 2
    w = jnp.sqrt(outlier_th_sum / (outlier_th_sum + grad2))
    w = 0.5 * (w + p_weights[:, None, :])

    absr = jnp.abs(residual)
    hw = jnp.where(absr < huber_th, 1.0, huber_th / jnp.maximum(absr, 1e-12))
    energy_pat = w * w * hw * residual * residual * (2.0 - hw)
    energy = jnp.sum(energy_pat, axis=-1)  # (P, F)

    hw_s = jnp.where(hw < 1.0, jnp.sqrt(hw), hw) * w
    resF = residual * hw_s                          # (P, F, 8)
    JIdx = jnp.stack([hit[..., 1] * hw_s, hit[..., 2] * hw_s], axis=-2)  # (P,F,2,8)
    JabF = jnp.stack(
        [drdA * hw_s * ab_zero[0], hw_s * ab_zero[1]], axis=-2
    )  # (P, F, 2, 8)

    wJI2_sum = jnp.sum(hw_s * hw_s * (hit[..., 1] ** 2 + hit[..., 2] ** 2), axis=-1)

    # inner products
    JIdx2 = jnp.einsum("pfik,pfjk->pfij", JIdx, JIdx, precision="highest")
    JabJIdx = jnp.einsum("pfik,pfjk->pfij", JabF, JIdx, precision="highest")
    Jab2 = jnp.einsum("pfik,pfjk->pfij", JabF, JabF, precision="highest")

    # state machine (reference :262-274)
    f_eth_t = f_energy_th if f_energy_th_target is None else f_energy_th_target
    th = jnp.maximum(f_energy_th[p_host][:, None], f_eth_t[None, :])
    is_outlier = (energy > th) | (wJI2_sum < 2.0)
    energy_clamped = jnp.where(is_outlier, th, energy)

    was_oob = r_state == RES_OOB
    new_state = jnp.where(
        ~all_ok, RES_OOB, jnp.where(is_outlier, RES_OUTLIER, RES_IN)
    )
    new_state = jnp.where(was_oob | ~r_exists, RES_OOB, new_state)

    center_proj = jnp.stack([Ku0, Kv0, new_idepth], axis=-1)  # (P, F, 3)

    return dict(
        Jpdxi=Jpdxi, Jpdc=Jpdc, Jpdd=Jpdd,
        JIdx=JIdx, JabF=JabF, resF=resF,
        JIdx2=JIdx2, JabJIdx=JabJIdx, Jab2=Jab2,
        energy=energy_clamped,
        energy_raw=energy,
        new_state=new_state,
        center_proj=center_proj,
    )


def _pair_ids(p_host, F):
    """(P, F) pair index host*F + target."""
    P = p_host.shape[0]
    tgt = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :], (P, F))
    return p_host[:, None] * F + tgt


def res_approx_mode1(J, delta_pair, p_host, c_delta, p_delta):
    """resApprox for FEJ residuals: res_toZero + J*delta
    (AccumulatedTopHessian.cpp:83-100).  delta_pair: (F, F, 8) adjoint-
    transported frame deltas; c_delta: (4,); p_delta: (P,)."""
    dp = delta_pair[p_host]  # (P, F, 8)
    Jp_dx = (
        jnp.einsum("pfk,pfk->pf", J["Jpdxi"][:, :, 0, :], dp[..., :6])
        + jnp.einsum("pfk,k->pf", J["Jpdc"][:, :, 0, :], c_delta)
        + J["Jpdd"][..., 0] * p_delta[:, None]
    )
    Jp_dy = (
        jnp.einsum("pfk,pfk->pf", J["Jpdxi"][:, :, 1, :], dp[..., :6])
        + jnp.einsum("pfk,k->pf", J["Jpdc"][:, :, 1, :], c_delta)
        + J["Jpdd"][..., 1] * p_delta[:, None]
    )
    return (
        J["res_toZero"]
        + J["JIdx"][:, :, 0, :] * Jp_dx[..., None]
        + J["JIdx"][:, :, 1, :] * Jp_dy[..., None]
        + J["JabF"][:, :, 0, :] * dp[..., 6:7]
        + J["JabF"][:, :, 1, :] * dp[..., 7:8]
    )


@partial(jax.jit, static_argnames=("F",))
def accumulate_top(J, res_approx, active, p_host, F: int):
    """Sum the 13x13 [Jpdc(4), Jpdxi(6), ab(2), r(1)] system per (h,t) pair.

    J fields: (P,F,...); res_approx: (P,F,8); active: (P,F) mask.
    Returns acc (F*F, 13, 13) float32, nres (scalar), and per-point Schur
    ingredients Hdd (P,), bd (P,), Hcd (P,4).
    """
    m = active.astype(jnp.float32)
    # 13-vector rows per pattern pixel: [JIdx^T G | JabF | res]
    G = jnp.concatenate([J["Jpdc"], J["Jpdxi"]], axis=-1)  # (P, F, 2, 10)
    rows10 = jnp.einsum("pfik,pfij->pfkj", J["JIdx"], G, precision="highest")
    # rows10: (P, F, 8, 10) = per-pattern-pixel geometry jacobian
    rows = jnp.concatenate(
        [
            rows10,
            J["JabF"].swapaxes(-1, -2),        # (P, F, 8, 2)
            res_approx[..., None],              # (P, F, 8, 1)
        ],
        axis=-1,
    )  # (P, F, 8, 13)
    acc_pf = jnp.einsum("pfki,pfkj->pfij", rows, rows, precision="highest")
    acc_pf = acc_pf * m[..., None, None]

    # Pair reduction as a segment_sum over 169-MINOR flattened blocks: a
    # scatter into a (..., 13, 13)-minor layout pads every block to an
    # (8, 128) tile (12x memory waste, ~17 ms/GN-iteration at preset-0);
    # the 169-minor target is lane-aligned and measurably FASTER than the
    # padded form (6-iter GN 205 vs 226 ms on v5e at P=16384).
    #
    # Do NOT replace this with a one-hot MXU matmul
    # (einsum("pn,pe->ne", one_hot(pair), acc_pf)): standalone that
    # contraction honors precision="highest", but fused inside the GN
    # while_loop XLA merges it with the producer and the reduction runs at
    # ~bf16 precision -- a 0.5%% Hessian error that compounds over GN
    # iterations (window RMSE 3.30 -> 15.35 on a 350-frame affine-drift
    # sequence, tripping the reference's initFailed thresholds).  It also
    # measured SLOWER in-program (263 ms) than either scatter form.
    pair = _pair_ids(p_host, F).reshape(-1)
    acc = jax.ops.segment_sum(
        acc_pf.reshape(-1, 13 * 13), pair, num_segments=F * F
    ).reshape(F * F, 13, 13)
    nres = jnp.sum(active)

    # per-point Schur ingredients (AccumulatedTopHessian.cpp:141-146)
    JI_r = jnp.einsum("pfik,pfk->pfi", J["JIdx"], res_approx, precision="highest")  # (P,F,2)
    Ji2_Jpdd = jnp.einsum("pfij,pfj->pfi", J["JIdx2"], J["Jpdd"], precision="highest")
    bd = jnp.sum(m * jnp.einsum("pfi,pfi->pf", JI_r, J["Jpdd"]), axis=1)
    Hdd = jnp.sum(m * jnp.einsum("pfi,pfi->pf", Ji2_Jpdd, J["Jpdd"]), axis=1)
    Hcd = jnp.sum(
        m[..., None] * jnp.einsum("pfik,pfi->pfk", J["Jpdc"], Ji2_Jpdd), axis=1
    )
    return acc, nres, Hdd, bd, Hcd


@partial(jax.jit, static_argnames=("F",))
def compute_JpJdF(J, F: int):
    """Per-residual 8-vector JpJdF (EnergyFunctionalStructs.cpp:39-50)."""
    JI_JI_Jd = jnp.einsum("pfij,pfj->pfi", J["JIdx2"], J["Jpdd"], precision="highest")
    head = jnp.einsum("pfik,pfi->pfk", J["Jpdxi"], JI_JI_Jd, precision="highest")
    tail = jnp.einsum("pfij,pfj->pfi", J["JabJIdx"], J["Jpdd"], precision="highest")
    return jnp.concatenate([head, tail], axis=-1)  # (P, F, 8)


@partial(jax.jit, static_argnames=("F",))
def accumulate_sc(
    JpJdF,                # (P, F, 8)
    Hcd, bdSum, HdiF,     # (P,4), (P,), (P,)
    active,               # (P, F)
    p_host, F: int,
):
    """Schur-complement accumulation (AccumulatedSCHessian.cpp:34-77).

    Returns accD (F,F,F,8,8): [host, t1, t2], accE (F,F,8,4), accEB (F,F,8),
    accHcc (4,4), accbc (4,).
    """
    m = active.astype(jnp.float32)
    Jm = JpJdF * m[..., None]

    hot = jax.nn.one_hot(p_host, F, dtype=jnp.float32)  # (P, F)

    # accD[h, t1, t2] = sum_p hot[p,h] * HdiF_p * Jm[p,t1] Jm[p,t2]^T
    accD = jnp.einsum("ph,p,pti,puj->htuij", hot, HdiF, Jm, Jm, precision="highest")
    # accE[h, t] = sum_p hot * HdiF * Jm[p,t] Hcd_p^T
    accE = jnp.einsum("ph,p,pti,pj->htij", hot, HdiF, Jm, Hcd, precision="highest")
    # accEB[h, t] = sum_p hot * HdiF*bdSum * Jm[p,t]
    accEB = jnp.einsum("ph,p,pti->hti", hot, HdiF * bdSum, Jm, precision="highest")
    # calib block: active points only (ngoodres > 0 handled via HdiF=0)
    accHcc = jnp.einsum("p,pi,pj->ij", HdiF, Hcd, Hcd, precision="highest")
    accbc = jnp.einsum("p,pi->i", HdiF * bdSum, Hcd, precision="highest")
    return accD, accE, accEB, accHcc, accbc


@partial(jax.jit, static_argnames=("F",))
def resubstitute(
    x_c,                  # (4,) calib increment
    xAd,                  # (F, F, 8) transported frame increments
    JpJdF, active, p_host,
    HcdSum, bdSum, HdiF,  # (P,4), (P,), (P,)
    ngood,                # (P,) number of active residuals
    F: int,
):
    """Idepth steps (EnergyFunctional.cpp:292-317): step = -b*HdiF with
    b = bdSum - xc.Hcd - sum_r xAd[h,t].JpJdF."""
    m = active.astype(jnp.float32)
    xa = xAd[p_host]  # (P, F, 8)
    dotr = jnp.sum(m * jnp.einsum("pfk,pfk->pf", xa, JpJdF), axis=1)
    b = bdSum - jnp.einsum("k,pk->p", x_c, HcdSum) - dotr
    step = -b * HdiF
    return jnp.where((ngood > 0) & jnp.isfinite(step), step, 0.0)
