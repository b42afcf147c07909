"""Immature points: epipolar depth filter + activation.

Rebuild of ImmaturePoint (reference: src/FullSystem/ImmaturePoint.cpp) and
optimizeImmaturePoint (src/FullSystem/FullSystemOptPoint.cpp) as batched
fixed-shape kernels:

* trace_points: the epipolar line search (traceOn :76-435) vmapped over all
  immature points of all hosts against one new frame.  The <=100-step
  discrete search becomes a fixed 100-slot masked scan; the 3-iteration GN
  refinement along the line is unrolled.  Status transitions, the
  gradient-vs-epipolar error bound, the quality (2nd-best ratio) and the
  interval update replicate the reference formulas.
* activate_points: idepth-only LM over all window frames
  (linearizeResidual :497-564 + the LM ladder of optimizeImmaturePoint
  :51-206) vmapped over candidate points.
* make_immature_data: pattern colors / gradient weights / gradH at point
  creation (ImmaturePoint ctor :32-61).

Statuses (reference ImmaturePoint.h):
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PATTERN
from ..ops.interp import (
    QUAD_FAST_DTYPE, build_quad, interp1, interp1q, interp3, interp3q)

IPS_GOOD = 0
IPS_OOB = 1
IPS_OUTLIER = 2
IPS_SKIPPED = 3
IPS_BADCONDITION = 4
IPS_UNINITIALIZED = 5

_N_STEPS = 100


def n_steps_for(w_img: int, h_img: int, max_pix_search_frac: float,
                stepsize: float = 1.0) -> int:
    """The discrete search never exceeds maxPixSearch pixels (reference
    :225-230), so size the slot axis to the geometry instead of the
    worst-case 100 (gathers are the cost on TPU)."""
    return min(_N_STEPS, int((w_img + h_img) * max_pix_search_frac / stepsize) + 3)


def search_bucket_for(n_slots: int) -> int | None:
    """Static compaction bucket for the epipolar search (trace_points
    search_bucket): the needs-search set is ~10-30% of the slots in a
    steady-state window (measured 2.4-9.2k of 32768 at KITTI-class
    preset-0), so N//4 (power of two, floor 2048) covers the typical load;
    rare overflow rotates to different slots each call."""
    b = 2048
    while b < n_slots // 4:
        b *= 2
    return b if b < n_slots else None


@jax.jit
def make_immature_data(dI, u, v):
    """Pattern colors, weights, gradH, energyTH ingredients for new points.
    u, v: (N,) pixel coords.  Returns color (N,8), weights (N,8),
    gradH (N,2,2), ok (N,)."""
    pat = jnp.asarray(PATTERN, jnp.float32)
    up = u[:, None] + pat[None, :, 0]
    vp = v[:, None] + pat[None, :, 1]
    samp = interp3(dI, up, vp)
    color = samp[..., 0]
    g = samp[..., 1:]
    gradH = jnp.einsum("nki,nkj->nij", g, g, precision="highest")
    # outlierTHSumComponent = 50*50 (settings.cpp:103)
    w = jnp.sqrt(2500.0 / (2500.0 + jnp.sum(g * g, axis=-1)))
    ok = jnp.all(jnp.isfinite(color), axis=-1)
    return color, w, gradH, ok


@partial(jax.jit, static_argnames=(
    "huber_th", "w_img", "h_img", "n_steps", "stepsize", "gn_iters",
    "gn_threshold", "slack_interval", "min_improvement", "extra_slack",
    "search_bucket"))
def trace_points(
    new_dI,                       # (H, W, 3)
    u, v, color, weights, gradH,  # (N,), (N,8), (N,2,2)
    idepth_min, idepth_max,       # (N,)  (idepth_max may be inf)
    status, quality, energy_th,   # (N,)
    host_KRKi, host_Kt, host_aff, # (Fh,3,3), (Fh,3), (Fh,2) per host frame
    p_host,                       # (N,) int32
    max_pix_search_frac,          # scalar (setting_maxPixSearch)
    huber_th: float, w_img: int, h_img: int, n_steps: int = _N_STEPS,
    # trace knobs (reference settings.cpp:164-174)
    stepsize: float = 1.0,        # setting_trace_stepsize
    gn_iters: int = 3,            # setting_trace_GNIterations
    gn_threshold: float = 0.1,    # setting_trace_GNThreshold
    slack_interval: float = 1.5,  # setting_trace_slackInterval
    min_improvement: float = 2.0, # setting_trace_minImprovementFactor
    extra_slack: float = 1.2,     # setting_trace_extraSlackOnTH
    # search compaction (rebuild optimization, see module docstring)
    valid=None,                   # (N,) bool slot-live mask (None = all)
    search_bucket: int | None = None,
    rot=0,                        # rotation offset for overflow fairness
):
    """Vectorized ImmaturePoint::traceOn.  Returns new (idepth_min,
    idepth_max, status, quality, pixel_interval, last_u, last_v, touched).

    The reference's traceOn returns EARLY for skipped / OOB / outlier
    points before touching the image (ImmaturePoint.cpp:145-192), and in
    a steady-state window only ~10-30%% of the slots reach the discrete
    search (measured 2.4-9.2k of 32768 at KITTI-class preset-0).  With
    ``search_bucket`` set, the expensive stages -- the (K, n_steps, 8)
    line-search gather and the GN refine -- run only for a compacted
    index set of points that actually need searching; the cheap per-point
    geometry and the status machine stay dense.  Overflow beyond the
    bucket keeps the point's state untouched for this frame (touched
    False -> the caller keeps old values; the rotating ``rot`` offset
    guarantees no starvation).  This also restores the reference's
    early-return semantics exactly: skipped/OOB points no longer have
    their quality perturbed by a degenerate 2-step search."""
    KRKi = host_KRKi[p_host]
    Kt = host_Kt[p_host]
    aff = host_aff[p_host]
    pat = jnp.asarray(PATTERN, jnp.float32)
    max_pix_search = (w_img + h_img) * max_pix_search_frac

    was_oob = status == IPS_OOB
    pr = jnp.einsum("nij,nj->ni", KRKi,
                    jnp.stack([u, v, jnp.ones_like(u)], -1), precision="highest")
    ptp_min = pr + Kt * idepth_min[:, None]
    u_min = ptp_min[:, 0] / ptp_min[:, 2]
    v_min = ptp_min[:, 1] / ptp_min[:, 2]
    min_ok = (u_min > 4) & (v_min > 4) & (u_min < w_img - 5) & (v_min < h_img - 5)

    have_max = jnp.isfinite(idepth_max)
    ptp_max = pr + Kt * jnp.where(have_max, idepth_max, 0.01)[:, None]
    u_max0 = ptp_max[:, 0] / ptp_max[:, 2]
    v_max0 = ptp_max[:, 1] / ptp_max[:, 2]

    dist_f = jnp.sqrt((u_min - u_max0) ** 2 + (v_min - v_max0) ** 2)
    # without a max: extend along direction to maxPixSearch (reference :158-180)
    dnorm = 1.0 / jnp.maximum(dist_f, 1e-9)
    u_max_inf = u_min + max_pix_search * (u_max0 - u_min) * dnorm
    v_max_inf = v_min + max_pix_search * (v_max0 - v_min) * dnorm
    u_max = jnp.where(have_max, u_max0, u_max_inf)
    v_max = jnp.where(have_max, v_max0, v_max_inf)
    dist = jnp.where(have_max, dist_f, max_pix_search)
    max_ok = (u_max > 4) & (v_max > 4) & (u_max < w_img - 5) & (v_max < h_img - 5)

    # skip if interval already tight (reference :145-155)
    skip = have_max & (dist < slack_interval)

    # OOB on big scale change (:185-192)
    scale_ok = (idepth_min < 0) | ((ptp_min[:, 2] > 0.75) & (ptp_min[:, 2] < 1.5))

    # geometric error bound from gradH vs epipolar direction (:196-216)
    dx = u_max - u_min
    dy = v_max - v_min
    d_ep = jnp.stack([dx, dy], -1)
    d_pe = jnp.stack([dy, -dx], -1)
    a_q = jnp.einsum("ni,nij,nj->n", d_ep, gradH, d_ep)
    b_q = jnp.einsum("ni,nij,nj->n", d_pe, gradH, d_pe)
    error_in_pixel = 0.2 + 0.2 * (a_q + b_q) / jnp.maximum(a_q, 1e-9)
    bad_condition = (error_in_pixel * min_improvement > dist) & have_max
    error_in_pixel = jnp.minimum(error_in_pixel, 10.0)

    # discrete search along the line, step length = setting_trace_stepsize px
    dxn = stepsize * dx / jnp.maximum(dist, 1e-9)
    dyn = stepsize * dy / jnp.maximum(dist, 1e-9)
    dir_finite = jnp.isfinite(dxn) & jnp.isfinite(dyn)
    dist_c = jnp.minimum(dist, max_pix_search)
    num_steps = jnp.minimum((1.9999 + dist_c / stepsize).astype(jnp.int32), n_steps - 1)
    rand_shift = u_min * 1000.0 - jnp.floor(u_min * 1000.0)
    ptx = u_min - rand_shift * dxn
    pty = v_min - rand_shift * dyn

    rotp = KRKi[:, :2, :2]  # Rplane (:233)
    rp = jnp.einsum("nij,kj->nki", rotp, pat, precision="highest")  # (N,8,2)

    # the points that actually reach the discrete search (the reference's
    # early returns: skip, OOB, prior OOB status, bad condition --
    # ImmaturePoint.cpp:145-230 all return before sampling the image)
    oob_now = ~min_ok | (~max_ok) | (~scale_ok) | (~dir_finite)
    valid_m = jnp.ones_like(was_oob) if valid is None else valid
    needs = valid_m & ~was_oob & ~skip & ~oob_now & ~bad_condition

    # quad tables built once, OUTSIDE the GN scan below (a build inside
    # the scan body re-materializes the ~10x tile-padded table per step).
    # The discrete search (quad1) is the biggest gather in the system
    # (K x n_steps x 8 samples) and only picks the argmin starting step
    # for the f32 GN polish (quad3), so f16 rows are safe there -- the
    # 350-frame parity harness pins ATE unchanged, and the gather runs
    # ~3x faster (ops/interp.py QUAD_FAST_DTYPE note).
    quad1 = build_quad(new_dI[..., 0], dtype=QUAD_FAST_DTYPE)
    quad3 = build_quad(new_dI)

    def run_search(ptx, pty, dxn, dyn, num_steps, rp, aff, color, weights,
                   quality):
        steps = jnp.arange(n_steps, dtype=jnp.float32)
        sx = ptx[:, None] + steps[None, :] * dxn[:, None]     # (K,S)
        sy = pty[:, None] + steps[None, :] * dyn[:, None]
        px = sx[:, :, None] + rp[:, None, :, 0]               # (K,S,8)
        py = sy[:, :, None] + rp[:, None, :, 1]
        hit = interp1q(quad1, h_img, w_img, px, py)
        finite = jnp.isfinite(hit)
        res = hit - (aff[:, None, None, 0] * color[:, None, :]
                     + aff[:, None, None, 1])
        absr = jnp.abs(res)
        hw = jnp.where(absr < huber_th, 1.0, huber_th / jnp.maximum(absr, 1e-12))
        e_pat = jnp.where(finite, hw * res * res * (2.0 - hw), 1e5)
        energies = jnp.sum(e_pat, axis=-1)                    # (K,S)
        step_valid = steps[None, :] < num_steps[:, None].astype(jnp.float32)
        energies = jnp.where(step_valid, energies, 1e10)

        best_idx = jnp.argmin(energies, axis=-1)
        best_energy = jnp.min(energies, axis=-1)
        best_u = ptx + best_idx.astype(jnp.float32) * dxn
        best_v = pty + best_idx.astype(jnp.float32) * dyn

        # second best outside +-2 (setting_minTraceTestRadius)
        idxs = jnp.arange(n_steps)
        far = jnp.abs(idxs[None, :] - best_idx[:, None]) > 2
        second = jnp.min(jnp.where(far, energies, 1e10), axis=-1)
        new_quality = second / jnp.maximum(best_energy, 1e-12)
        quality_out = jnp.where(
            (new_quality < quality) | (num_steps > 10), new_quality, quality
        )

        # GN refinement along the line (:318-380), gn_iters iterations
        # unrolled; per-point freeze once the step falls under gn_threshold
        # (the loop break)
        def gn_iter(carry, _):
            bu, bv, be, step_back, ub, vb, done = carry
            hx = bu[:, None] + rp[:, :, 0]
            hy = bv[:, None] + rp[:, :, 1]
            hc = interp3q(quad3, h_img, w_img, hx, hy)
            fin = jnp.isfinite(hc[..., 0])
            r = hc[..., 0] - (aff[:, None, 0] * color + aff[:, None, 1])
            dres = dxn[:, None] * hc[..., 1] + dyn[:, None] * hc[..., 2]
            ar = jnp.abs(r)
            hw_ = jnp.where(ar < huber_th, 1.0, huber_th / jnp.maximum(ar, 1e-12))
            H = 1.0 + jnp.sum(jnp.where(fin, hw_ * dres * dres, 0.0), -1)
            b = jnp.sum(jnp.where(fin, hw_ * r * dres, 0.0), -1)
            en = jnp.sum(
                jnp.where(fin, weights**2 * hw_ * r * r * (2 - hw_), 1e5), -1
            )
            worse = en > be
            # back-step on worse, GN step on better (:362-392)
            sb_new = jnp.where(worse, step_back * 0.5, jnp.clip(-b / H, -0.5, 0.5))
            sb_new = jnp.where(jnp.isfinite(sb_new), sb_new, 0.0)
            sb_new = jnp.where(done, 0.0, sb_new)
            # once done, freeze at the current (post-step) position, as the
            # reference's break does; otherwise accept/back-step as usual
            ub_n = jnp.where(done, bu, jnp.where(worse, ub, bu))
            vb_n = jnp.where(done, bv, jnp.where(worse, vb, bv))
            bu_n = ub_n + sb_new * dxn
            bv_n = vb_n + sb_new * dyn
            be_n = jnp.where(done | worse, be, en)
            done_n = done | (jnp.abs(sb_new) < gn_threshold)
            return (bu_n, bv_n, be_n, sb_new, ub_n, vb_n, done_n), None

        init = (best_u, best_v, jnp.full_like(best_energy, 1e5),
                jnp.zeros_like(best_u), best_u, best_v,
                jnp.zeros_like(best_u, dtype=bool))
        (best_u, best_v, best_energy, _, _, _, _), _ = jax.lax.scan(
            gn_iter, init, None, length=max(gn_iters, 1)
        )
        return best_u, best_v, best_energy, quality_out

    N = u.shape[0]
    if search_bucket is not None and search_bucket < N:
        K = search_bucket
        # rotation offset -> overflow beyond the bucket hits different
        # slots each call (no starvation)
        rolled = jnp.roll(needs, -rot)
        (ridx,) = jnp.nonzero(rolled, size=K, fill_value=N)
        idx = jnp.where(ridx < N, (ridx + rot) % N, N)

        def tk(a):
            return jnp.take(a, idx, axis=0, mode="fill", fill_value=0)

        bu_c, bv_c, be_c, q_c = run_search(
            tk(ptx), tk(pty), tk(dxn), tk(dyn), tk(num_steps), tk(rp),
            tk(aff), tk(color), tk(weights), tk(quality))
        zf = jnp.zeros(N, bu_c.dtype)
        best_u = zf.at[idx].set(bu_c, mode="drop")
        best_v = zf.at[idx].set(bv_c, mode="drop")
        outlier_e = jnp.zeros(N, bool).at[idx].set(
            ~(be_c < tk(energy_th) * extra_slack), mode="drop")
        quality_out = quality.at[idx].set(q_c, mode="drop")
        searched = jnp.zeros(N, bool).at[idx].set(ridx < N, mode="drop")
    else:
        best_u, best_v, best_energy, quality_out = run_search(
            ptx, pty, dxn, dyn, num_steps, rp, aff, color, weights, quality)
        outlier_e = ~(best_energy < energy_th * extra_slack)
        searched = needs

    # new idepth interval from best position +- errorInPixel (:404-434)
    use_x = dxn * dxn > dyn * dyn
    e_dx = error_in_pixel * dxn
    e_dy = error_in_pixel * dyn

    def id_from_u(bu):
        return (pr[:, 2] * bu - pr[:, 0]) / (Kt[:, 0] - bu * Kt[:, 2])

    def id_from_v(bv):
        return (pr[:, 2] * bv - pr[:, 1]) / (Kt[:, 1] - bv * Kt[:, 2])

    idmin_new = jnp.where(use_x, id_from_u(best_u - e_dx), id_from_v(best_v - e_dy))
    idmax_new = jnp.where(use_x, id_from_u(best_u + e_dx), id_from_v(best_v + e_dy))
    lo = jnp.minimum(idmin_new, idmax_new)
    hi = jnp.maximum(idmin_new, idmax_new)
    interval_bad = ~(jnp.isfinite(lo) & jnp.isfinite(hi)) | (hi < 0)

    # ---- combine state machine ----
    out_state = jnp.full_like(status, IPS_GOOD)
    out_state = jnp.where(interval_bad, IPS_OUTLIER, out_state)
    out_state = jnp.where(outlier_e,
                          jnp.where(status == IPS_OUTLIER, IPS_OOB, IPS_OUTLIER),
                          out_state)
    out_state = jnp.where(bad_condition, IPS_BADCONDITION, out_state)
    out_state = jnp.where(skip, IPS_SKIPPED, out_state)
    out_state = jnp.where(oob_now, IPS_OOB, out_state)
    out_state = jnp.where(was_oob, IPS_OOB, out_state)

    # bucket overflow: the point needed a search but did not get one this
    # call -- every output must stay untouched (the caller keys on this)
    touched = searched | ~needs
    out_state = jnp.where(touched, out_state, status)

    updated = (out_state == IPS_GOOD) & searched
    idepth_min_out = jnp.where(updated, lo, idepth_min)
    idepth_max_out = jnp.where(updated, hi, idepth_max)
    pixel_interval = jnp.where(updated, 2.0 * error_in_pixel,
                               jnp.where(skip | bad_condition, dist, 0.0))
    last_u = jnp.where(updated, best_u, 0.5 * (u_min + u_max))
    last_v = jnp.where(updated, best_v, 0.5 * (v_min + v_max))
    return (idepth_min_out, idepth_max_out, out_state, quality_out,
            pixel_interval, last_u, last_v, touched)


def _activate_core(
    images,                        # (F, H, W, 3)
    u, v, color, weights,          # (N,), (N,8), (N,8)
    idepth_init,                   # (N,)
    p_host,                        # (N,)
    energy_th,                     # (N,)
    PRE_R, PRE_t, PRE_aff,         # (F,F,3,3), (F,F,3), (F,F,2) current pose
    frame_active,                  # (F,) bool
    calib,
    min_idepth_h_act: float,
    iters: int, huber_th: float, w_img: int, h_img: int,
    images_quad=None,              # optional prebuilt (F, H*W, 12) tables
):
    """Batched optimizeImmaturePoint: idepth-only LM over all other frames.

    Returns packed (N, 2+F): [idepth | ok | per-target IN flags].
    """
    fx, fy, cx, cy = calib[0], calib[1], calib[2], calib[3]
    F = images.shape[0]
    pat = jnp.asarray(PATTERN, jnp.float32)
    R = PRE_R[p_host]      # (N, F, 3, 3)
    t = PRE_t[p_host]
    affs = PRE_aff[p_host]
    # residual exists for every active frame except the host
    tgt_ok = frame_active[None, :] & (
        jnp.arange(F)[None, :] != p_host[:, None]
    )

    KliP = jnp.stack(
        [
            (u[:, None] + pat[None, :, 0] - cx) / fx,
            (v[:, None] + pat[None, :, 1] - cy) / fy,
            jnp.ones((u.shape[0], 8), jnp.float32),
        ],
        axis=-1,
    )  # (N, 8, 3)

    # one quad-tap table per frame, shared by every LM evaluation
    # (build_quad hoisting + bandwidth notes in ops/interp.py); callers
    # holding the window's device-resident quad store pass it in and skip
    # the build entirely
    H_img, W_img = images.shape[1], images.shape[2]
    if images_quad is None:
        images_quad = jax.vmap(build_quad)(images)

    def energy_Hb(idepth):
        ptp = (
            jnp.einsum("nfij,nkj->nfki", R, KliP, precision="highest")
            + t[:, :, None, :] * idepth[:, None, None, None]
        )  # (N, F, 8, 3)
        drescale = 1.0 / ptp[..., 2]
        un = ptp[..., 0] * drescale
        vn = ptp[..., 1] * drescale
        Ku = un * fx + cx
        Kv = vn * fy + cy
        inb = (
            (drescale > 0) & (Ku > 1.1) & (Kv > 1.1)
            & (Ku < w_img - 3) & (Kv < h_img - 3)
        )
        hit = jax.vmap(lambda q, x, y: interp3q(q, H_img, W_img, x, y),
                       in_axes=(0, 1, 1), out_axes=1)(images_quad, Ku, Kv)
        fin = jnp.isfinite(hit[..., 0])
        res_ok = jnp.all(inb & fin, axis=-1) & tgt_ok     # (N, F)
        r = hit[..., 0] - (affs[..., 0, None] * color[:, None, :] + affs[..., 1, None])
        ar = jnp.abs(r)
        hw = jnp.where(ar < huber_th, 1.0, huber_th / jnp.maximum(ar, 1e-12))
        wsq = weights[:, None, :] ** 2
        e_pat = wsq * hw * r * r * (2 - hw)
        e_res = jnp.sum(e_pat, axis=-1)                   # (N, F)
        # outlier clamp per residual (energyTH * outlierTHSlack=1)
        res_in = res_ok & (e_res <= energy_th[:, None])
        e_res = jnp.where(res_ok, jnp.minimum(e_res, energy_th[:, None]), 0.0)
        dxi = hit[..., 1] * fx
        dyi = hit[..., 2] * fy
        d_id = (
            dxi * drescale * (t[:, :, None, 0] - t[:, :, None, 2] * un)
            + dyi * drescale * (t[:, :, None, 1] - t[:, :, None, 2] * vn)
        )
        hww = hw * wsq
        Hdd = jnp.sum(jnp.where(res_in[..., None], hww * d_id * d_id, 0.0), (-1, -2))
        bd = jnp.sum(jnp.where(res_in[..., None], hww * r * d_id, 0.0), (-1, -2))
        E = jnp.sum(e_res, axis=-1)
        return E, Hdd, bd, res_in

    idepth = idepth_init
    E, Hdd, bd, res_in = energy_Hb(idepth)
    ok0 = jnp.isfinite(E) & (Hdd >= min_idepth_h_act)

    lam = jnp.full_like(idepth, 0.1)
    for _ in range(iters):
        step = bd / (Hdd * (1 + lam))
        new_id = idepth - step
        E2, Hdd2, bd2, res_in2 = energy_Hb(new_id)
        accept = E2 < E
        idepth = jnp.where(accept, new_id, idepth)
        E = jnp.where(accept, E2, E)
        Hdd = jnp.where(accept, Hdd2, Hdd)
        bd = jnp.where(accept, bd2, bd)
        res_in = jnp.where(accept[:, None], res_in2, res_in)
        lam = jnp.where(accept, lam * 0.5, lam * 5.0)

    ngood = jnp.sum(res_in, axis=-1)
    ok = ok0 & jnp.isfinite(idepth) & (Hdd >= min_idepth_h_act) & (ngood >= 1)
    # packed single-pull output: [idepth | ok | res_in(F)]
    packed = jnp.concatenate(
        [idepth[:, None], ok[:, None].astype(jnp.float32),
         res_in.astype(jnp.float32)], axis=-1
    )
    return packed


activate_points = partial(jax.jit, static_argnames=(
    "iters", "huber_th", "w_img", "h_img"))(_activate_core)


def distance_map(point_u, point_v, valid, h1, w1, iters=40):
    """Chebyshev-ish BFS distance transform on the half-res grid
    (reference CoarseDistanceMap :1410-1552), as iterated min-pool."""
    occ = np.zeros((h1, w1), np.float32)
    d = np.full((h1, w1), 1e4, np.float32)
    ui = np.clip(point_u[valid].astype(int), 0, w1 - 1)
    vi = np.clip(point_v[valid].astype(int), 0, h1 - 1)
    d[vi, ui] = 0
    return _grow_dist(jnp.asarray(d), iters)


@partial(jax.jit, static_argnames=("iters",))
def _grow_dist(d, iters: int):
    def body(_, d):
        out = d
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)):
            out = jnp.minimum(out, jnp.roll(d, (dy, dx), (0, 1)) + 1.0)
        return out

    return jax.lax.fori_loop(0, iters, body, d)


# ---------------------------------------------------------------------------
# Device-resident immature state helpers (transfer-frugal orchestration):
# static fields are written once at creation, trace-mutable fields stay on
# device between frames, and the host pulls one packed array per keyframe.
# ---------------------------------------------------------------------------


def empty_device_state(F: int, M: int):
    N = F * M
    static = dict(
        u=jnp.zeros(N, jnp.float32), v=jnp.zeros(N, jnp.float32),
        color=jnp.zeros((N, 8), jnp.float32), weights=jnp.zeros((N, 8), jnp.float32),
        gradH=jnp.zeros((N, 2, 2), jnp.float32),
        energy_th=jnp.zeros(N, jnp.float32),
        my_type=jnp.ones(N, jnp.float32),
        valid=jnp.zeros(N, bool),
    )
    trace = dict(
        idepth_min=jnp.zeros(N, jnp.float32),
        idepth_max=jnp.full(N, jnp.nan, jnp.float32),
        status=jnp.full(N, IPS_UNINITIALIZED, jnp.int32),
        quality=jnp.full(N, 10000.0, jnp.float32),
        interval=jnp.zeros(N, jnp.float32),
    )
    return static, trace


@partial(jax.jit, static_argnames=("M",))
def set_block(static, trace, block, new_static, new_trace, M: int):
    """Write one frame's M-slot block (creation of new traces)."""
    start = block * M

    def upd(dst, src):
        return jax.lax.dynamic_update_slice(
            dst, src.astype(dst.dtype), (start,) + (0,) * (dst.ndim - 1)
        )

    static2 = {k: upd(static[k], new_static[k]) for k in static}
    trace2 = {k: upd(trace[k], new_trace[k]) for k in trace}
    return static2, trace2


@partial(jax.jit, static_argnames=("F", "M"))
def shift_down(static, trace, perm, F: int, M: int):
    """Apply a frame-block permutation (marginalization compaction)."""

    def reorder(a):
        return a.reshape((F, M) + a.shape[1:])[perm].reshape(a.shape)

    return ({k: reorder(v) for k, v in static.items()},
            {k: reorder(v) for k, v in trace.items()})


@jax.jit
def set_valid(static, valid):
    return dict(static, valid=valid)


@partial(jax.jit, static_argnames=(
    "huber_th", "w_img", "h_img", "F", "M", "n_steps", "stepsize", "gn_iters",
    "gn_threshold", "slack_interval", "min_improvement", "extra_slack",
    "search_bucket"))
def trace_update(static, trace, new_dI, KRKi, Kt, affs, max_pix_search_frac,
                 huber_th: float, w_img: int, h_img: int, F: int, M: int,
                 n_steps: int = _N_STEPS, stepsize: float = 1.0,
                 gn_iters: int = 3, gn_threshold: float = 0.1,
                 slack_interval: float = 1.5, min_improvement: float = 2.0,
                 extra_slack: float = 1.2,
                 search_bucket: int | None = None, rot=0):
    """One-call traceNewCoarse over the whole device-resident store."""
    hosts = jnp.repeat(jnp.arange(F, dtype=jnp.int32), M)
    res = trace_points(
        new_dI, static["u"], static["v"], static["color"], static["weights"],
        static["gradH"], trace["idepth_min"], trace["idepth_max"],
        trace["status"], trace["quality"], static["energy_th"],
        KRKi, Kt, affs, hosts, max_pix_search_frac,
        huber_th=huber_th, w_img=w_img, h_img=h_img, n_steps=n_steps,
        stepsize=stepsize, gn_iters=gn_iters, gn_threshold=gn_threshold,
        slack_interval=slack_interval, min_improvement=min_improvement,
        extra_slack=extra_slack,
        valid=static["valid"], search_bucket=search_bucket, rot=rot,
    )
    id_min, id_max, status, quality, interval, _, _, touched = res
    # untouched = bucket overflow this call: every field keeps its old
    # value (the point is traced on a later frame; see trace_points)
    v = static["valid"] & touched
    return dict(
        idepth_min=jnp.where(v, id_min, trace["idepth_min"]),
        idepth_max=jnp.where(v, id_max, trace["idepth_max"]),
        status=jnp.where(v, status, trace["status"]),
        quality=jnp.where(v, quality, trace["quality"]),
        interval=jnp.where(v, interval, trace["interval"]),
    )


@jax.jit
def pack_for_host(static, trace):
    """One (N, 8) f32 pull with everything the host activation logic needs."""
    return jnp.stack(
        [
            static["u"], static["v"],
            trace["idepth_min"], trace["idepth_max"],
            trace["status"].astype(jnp.float32), trace["quality"],
            trace["interval"], static["valid"].astype(jnp.float32),
        ],
        axis=-1,
    )


@jax.jit
def make_immature_data_packed(dI, u, v):
    """make_immature_data with a single packed output (N, 21):
    [color(8) | weights(8) | gradH flat(4) | ok(1)] -- one host pull."""
    color, w, gradH, ok = make_immature_data(dI, u, v)
    return jnp.concatenate(
        [color, w, gradH.reshape(gradH.shape[0], 4), ok[:, None].astype(jnp.float32)],
        axis=-1,
    )


def _activation_prep_core(static, trace, p_u, p_v, p_idepth, p_host, p_valid,
                          KRKi1, Kt1, flagged, newest, min_trace_quality,
                          F: int, M: int, C: int, h1: int, w1: int,
                          iters: int = 40):
    """activatePointsMT prep (reference FullSystem.cpp:764-934): candidate
    gating, dead/OOB deletion, level-1 projection and the BFS distance
    map.  Returns (n_cand, v4, cslot, cu, cv, idc_o, d0): the post-delete
    valid mask and the compacted candidate arrays (slot order, which the
    greedy spacing depends on); d0 is the distance-map gate value."""
    slot_host = jnp.repeat(jnp.arange(F, dtype=jnp.int32), M)
    upd = (slot_host != newest) & (slot_host < F)
    iv = static["valid"]
    idmin, idmax = trace["idepth_min"], trace["idepth_max"]
    status = trace["status"]
    dead = iv & (~jnp.isfinite(idmax) | (status == IPS_OUTLIER))
    v2 = jnp.where(upd, iv & ~dead, iv)
    st_ok = ((status == IPS_GOOD) | (status == IPS_SKIPPED)
             | (status == IPS_BADCONDITION) | (status == IPS_OOB))
    can = (v2 & st_ok & (trace["interval"] < 8)
           & (trace["quality"] > min_trace_quality) & ((idmax + idmin) > 0))
    v3 = jnp.where(upd & flagged[slot_host], v2 & can, v2)
    cand0 = can & upd
    idc = 0.5 * (idmax + idmin)
    R = KRKi1[slot_host]
    t = Kt1[slot_host]
    pt = (
        jnp.einsum("nij,nj->ni", R,
                   jnp.stack([static["u"], static["v"],
                              jnp.ones_like(static["u"])], -1),
                   precision="highest")
        + t * idc[:, None]
    )
    uu = pt[:, 0] / pt[:, 2]
    vv = pt[:, 1] / pt[:, 2]
    inb = (uu > 0) & (vv > 0) & (uu < w1) & (vv < h1)
    v4 = v3 & ~(cand0 & ~inb)
    cand = cand0 & inb

    # distance map from the window's active points (as activation_prep)
    Rp = KRKi1[p_host]
    tp = Kt1[p_host]
    ptp = (
        jnp.einsum("nij,nj->ni", Rp,
                   jnp.stack([p_u, p_v, jnp.ones_like(p_u)], -1),
                   precision="highest")
        + tp * p_idepth[:, None]
    )
    puu = ptp[:, 0] / ptp[:, 2]
    pvv = ptp[:, 1] / ptp[:, 2]
    pok = p_valid & (puu > 0) & (pvv > 0) & (puu < w1) & (pvv < h1) & (ptp[:, 2] > 0)
    u1 = jnp.clip(puu.astype(jnp.int32), 0, w1 - 1)
    v1 = jnp.clip(pvv.astype(jnp.int32), 0, h1 - 1)
    d = jnp.full((h1, w1), 1e4, jnp.float32)
    d = d.at[v1, u1].min(jnp.where(pok, 0.0, 1e4))
    d = _grow_dist(d, iters)

    # stable compaction in slot order (the reference's host/index iteration
    # order, which the greedy spacing depends on)
    order = jnp.argsort(~cand, stable=True)[:C]
    cslot = jnp.where(cand[order], order.astype(jnp.float32), -1.0)
    n_cand = jnp.sum(cand).astype(jnp.float32)
    cu = uu[order]
    cv = vv[order]
    d0 = (d[jnp.clip(cv.astype(jnp.int32), 0, h1 - 1),
            jnp.clip(cu.astype(jnp.int32), 0, w1 - 1)]
          + (cu - jnp.floor(cu)))
    return n_cand, v4, cslot, cu, cv, idc[order], d0


@partial(jax.jit, static_argnames=("F", "M", "C", "h1", "w1", "iters"))
def activation_prep2(static, trace, p_u, p_v, p_idepth, p_host, p_valid,
                     KRKi1, Kt1, flagged, newest, min_trace_quality,
                     F: int, M: int, C: int, h1: int, w1: int,
                     iters: int = 40):
    """One-flat-pull wrapper of _activation_prep_core:
    [n_cand | valid(F*M) | slot(C) | uu(C) | vv(C) | id0(C) | d0(C)]."""
    n_cand, v4, cslot, cu, cv, idc_o, d0 = _activation_prep_core(
        static, trace, p_u, p_v, p_idepth, p_host, p_valid,
        KRKi1, Kt1, flagged, newest, min_trace_quality,
        F=F, M=M, C=C, h1=h1, w1=w1, iters=iters)
    flat = jnp.concatenate([
        n_cand[None], v4.astype(jnp.float32),
        cslot, cu, cv, idc_o, d0,
    ])
    return flat


@partial(jax.jit,
         static_argnames=("F", "M", "C", "A", "h1", "w1", "dm_iters",
                          "iters", "huber_th", "w_img", "h_img"))
def activation_run(static, trace, images,
                   p_u, p_v, p_idepth, p_host, p_valid,
                   KRKi1, Kt1, flagged, newest, min_trace_quality,
                   min_act_dist,
                   PRE_R, PRE_t, PRE_aff, f_act, calib, min_idepth_h_act,
                   F: int, M: int, C: int, A: int, h1: int, w1: int,
                   dm_iters: int, iters: int, huber_th: float,
                   w_img: int, h_img: int, images_quad=None):
    """The ENTIRE activatePointsMT as one device program with one pull
    (reference FullSystem.cpp:764-934 + FullSystemOptPoint.cpp): candidate
    gating + distance map (_activation_prep_core), the greedy spacing loop
    (previously host-side -- a sequential lax loop over the candidates in
    slot order, exact reference semantics), gather of the accepted slots'
    static data from the device store, and the batched idepth LM.

    Also consumes the optimized candidates' valid bits on device, so the
    host adopts the returned mask with no write-back dispatch.

    Returns (flat, new_valid):
      flat = [n_cand, n_acc | valid(F*M) | slot(A) | packed(A*(2+F))]
      new_valid = the same post-consumption valid mask, device-resident.
    The static data of the accepted slots (u, v, color, ...) is NOT
    returned: the host keeps byte-identical mirrors in its ImmatureStores
    and gathers by slot id.
    """
    n_cand, v4, cslot, cu, cv, idc_o, d0 = _activation_prep_core(
        static, trace, p_u, p_v, p_idepth, p_host, p_valid,
        KRKi1, Kt1, flagged, newest, min_trace_quality,
        F=F, M=M, C=C, h1=h1, w1=w1, iters=dm_iters)

    kvalid = cslot >= 0
    sidx_c = jnp.clip(cslot.astype(jnp.int32), 0, F * M - 1)
    need = jnp.where(kvalid, min_act_dist * static["my_type"][sidx_c], jnp.inf)
    ui = jnp.clip(cu.astype(jnp.int32), 0, w1 - 1)
    vi = jnp.clip(cv.astype(jnp.int32), 0, h1 - 1)
    pass_d = kvalid & (d0 >= need)

    # greedy occupancy spacing, candidate (slot) order -- identical to the
    # reference host loop.  Grid padded by 4 on each side so the 9x9
    # chevron patch never clips (center (y,x) -> padded (y+4, x+4)).
    #
    # CHUNKED exact formulation: a one-candidate-per-iteration lax loop
    # costs ~12.5 us/step of fixed TPU loop overhead (~50 ms at C=4096).
    # The sequential dependency is only through the occupancy grid, and a
    # later candidate sees an earlier one IFF their Chebyshev distance is
    # <= 4 with stamp value max(|dy|,|dx|) -- so a chunk of B candidates
    # can be resolved from (a) the pre-chunk grid centers (one batched
    # gather) and (b) the in-chunk pairwise Chebyshev matrix (an unrolled
    # B-step micro-scan over registers), then the grid absorbs all of the
    # chunk's accepted stamps in ONE scatter-min (order-independent).
    # Bit-exact to the per-candidate loop (test_activation_greedy).
    chev = jnp.maximum(
        jnp.abs(jnp.arange(9) - 4)[:, None],
        jnp.abs(jnp.arange(9) - 4)[None, :]).astype(jnp.float32)
    B = 32
    assert C % B == 0, "candidate capacity must be a multiple of the chunk"

    n_loop = jnp.minimum(n_cand.astype(jnp.int32), C)
    occ0 = jnp.full((h1 + 8, w1 + 8), 1e4, jnp.float32)
    dy9 = jnp.arange(9, dtype=jnp.int32)

    def chunk_body(c, carry):
        occ, acc = carry
        base = c * B
        y = jax.lax.dynamic_slice(vi, (base,), (B,))
        x = jax.lax.dynamic_slice(ui, (base,), (B,))
        needk = jax.lax.dynamic_slice(need, (base,), (B,))
        passk = (jax.lax.dynamic_slice(pass_d, (base,), (B,))
                 & (base + jnp.arange(B) < n_loop))
        g = occ[y + 4, x + 4]
        ddy = jnp.abs(y[:, None] - y[None, :])
        ddx = jnp.abs(x[:, None] - x[None, :])
        pairv = jnp.where((ddy <= 4) & (ddx <= 4),
                          jnp.maximum(ddy, ddx).astype(jnp.float32),
                          jnp.inf)  # [j, k]
        accv = jnp.zeros(B, bool)
        for k in range(B):  # unrolled micro-scan (register ops only)
            before = jnp.arange(B) < k
            blocked = jnp.min(jnp.where(accv & before, pairv[:, k], jnp.inf))
            okk = passk[k] & (jnp.minimum(g[k], blocked) >= needk[k])
            accv = accv.at[k].set(okk)
        stamps = jnp.where(accv[:, None, None], chev[None], 1e4)
        yy = y[:, None, None] + dy9[None, :, None]
        xx = x[:, None, None] + dy9[None, None, :]
        occ = occ.at[yy, xx].min(stamps)
        acc = jax.lax.dynamic_update_slice(acc, accv, (base,))
        return occ, acc

    n_chunks = (n_loop + B - 1) // B
    _, acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                               (occ0, jnp.zeros(C, bool)))
    n_acc = jnp.sum(acc).astype(jnp.float32)

    # compact accepted candidates to A slots and gather their static data
    aorder = jnp.argsort(~acc, stable=True)[:A]
    asel = acc[aorder]
    slot_a = jnp.where(asel, cslot[aorder], -1.0)
    sidx = jnp.clip(slot_a.astype(jnp.int32), 0, F * M - 1)
    u_a = static["u"][sidx]
    v_a = static["v"][sidx]
    col_a = static["color"][sidx]
    wgt_a = static["weights"][sidx]
    eth_a = static["energy_th"][sidx]
    id0_a = idc_o[aorder]
    host_a = sidx // M

    packed = _activate_core(
        images, u_a, v_a, col_a, wgt_a, id0_a, host_a, eth_a,
        PRE_R, PRE_t, PRE_aff, f_act, calib, min_idepth_h_act,
        iters=iters, huber_th=huber_th, w_img=w_img, h_img=h_img,
        images_quad=images_quad)
    packed = jnp.where(asel[:, None], packed, 0.0)

    # consume the optimized candidates (activated or failed) on device
    acc_slots = jnp.where(acc, cslot.astype(jnp.int32), F * M)
    v5 = v4.at[acc_slots].set(False, mode="drop")

    flat = jnp.concatenate([
        n_cand[None], n_acc[None], v5.astype(jnp.float32),
        slot_a, packed.reshape(-1),
    ])
    return flat, v5


@partial(jax.jit, static_argnames=("h1", "w1", "iters"))
def activation_prep(static, trace, p_u, p_v, p_idepth, p_host, p_valid,
                    KRKi1, Kt1, h1: int, w1: int, iters: int = 40):
    """One call combining the per-KF host pulls of activatePointsMT: the
    packed immature state AND the level-1 BFS distance map seeded by
    projecting the active points into the just-inserted keyframe
    (reference CoarseDistanceMap::makeDistanceMap,
    CoarseTracker.cpp:1410-1446).  KRKi1/Kt1: (F,3,3)/(F,3) per-host
    K1 * R * Ki0 transforms at CURRENT poses."""
    packed = pack_for_host(static, trace)
    R = KRKi1[p_host]
    t = Kt1[p_host]
    pt = (
        jnp.einsum("nij,nj->ni", R,
                   jnp.stack([p_u, p_v, jnp.ones_like(p_u)], -1),
                   precision="highest")
        + t * p_idepth[:, None]
    )
    uu = pt[:, 0] / pt[:, 2]
    vv = pt[:, 1] / pt[:, 2]
    ok = p_valid & (uu > 0) & (vv > 0) & (uu < w1) & (vv < h1) & (pt[:, 2] > 0)
    u1 = jnp.clip(uu.astype(jnp.int32), 0, w1 - 1)
    v1 = jnp.clip(vv.astype(jnp.int32), 0, h1 - 1)
    d = jnp.full((h1, w1), 1e4, jnp.float32)
    d = d.at[v1, u1].min(jnp.where(ok, 0.0, 1e4))
    d = _grow_dist(d, iters)
    return packed, d
