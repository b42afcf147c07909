"""Coarse tracker: frame-to-keyframe direct image alignment.

TPU-native rebuild of CoarseTracker (reference:
src/FullSystem/CoarseTracker.cpp).  Design differences from the C++/SSE
original, chosen for the hardware:

* The per-level residual evaluation (calcRes, :891-1049) and the 8x8
  Gauss-Newton system (calcGSSSE, :828-885) are ONE fused dense computation
  over the full reference-depth map: every pixel carries a validity mask
  instead of being compacted into SSE buffers.  XLA fuses warp + bilinear
  gather + Huber + J-outer-product into a couple of HBM passes; the 8x8
  normal equations fall out of one einsum (f32 accumulation, replacing the
  hierarchical-shift float trick of MatrixAccumulators.h:72-88).
* The LM ladder (trackNewestCoarse, :1073-1259) keeps its exact control
  flow -- cutoff-repeat loop, accept/reject, lambda extrapolation, level
  repeat -- expressed as lax.while_loop / lax.cond so the whole pyramid
  descent is a single XLA program.
* The 26 motion hypotheses (FullSystem::trackNewCoarse,
  src/FullSystem/FullSystem.cpp:516-580) are vmapped into one batched
  pyramid descent instead of sequential retries; the common fast path
  (hypothesis 0 wins immediately, :655) is preserved by trying it alone
  first.

The reference-depth pyramid (makeCoarseDepthL0, :382-538) becomes a
scatter-add + 2x2 sum-pyramid + two dilation stencils + normalization, all
dense jnp ops.

Scaled-coordinate note: the reference solves the 8x8 system in SCALE_*
coordinates; because the scaling is diagonal it cancels everywhere except
the lambda-damping (also diagonal -- cancels too) and the convergence norm,
which we reproduce explicitly (see _INC_NORM_SCALE).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import build_quad, interp3q

# max LM iterations per level (reference CoarseTracker.cpp:1090)
_MAX_ITERATIONS = (10, 20, 50, 50, 50, 50)
_LAMBDA_EXTRAPOLATION_LIMIT = 0.001
# ||inc|| is measured in the reference's scaled coordinates:
# [trans/SCALE_XI_ROT(=1), rot/SCALE_XI_TRANS(=0.5), a/SCALE_A, b/SCALE_B]
_INC_NORM_SCALE = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.1, 0.001], np.float32)


def aff_from_to(exp_f, exp_t, a_f, b_f, a_t, b_t):
    """AffLight::fromToVecExposure (reference NumType.h:172-186)."""
    exp_f = jnp.where(exp_f == 0, 1.0, exp_f)
    exp_t = jnp.where(exp_t == 0, 1.0, exp_t)
    a = jnp.exp(a_t - a_f) * exp_t / exp_f
    b = b_t - a * b_f
    return a, b


# ---------------------------------------------------------------------------
# Reference depth-map pyramid (makeCoarseDepthL0)
# ---------------------------------------------------------------------------


def _dilate(idepth, wsum, diagonal: bool):
    """Fill holes from neighbors with weight > 0 (reference :435-494).

    diagonal=True uses the 4 diagonal neighbors (levels 0-1), else the
    4-connected cross (levels >= 2).  Reads from the pre-pass copy
    (weightSums_bak) so the fill is one synchronous step, like memcpy+loop.
    """
    if diagonal:
        offs = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    else:
        offs = [(0, -1), (0, 1), (-1, 0), (1, 0)]

    def shift(a, dy, dx):
        return jnp.roll(a, shift=(dy, dx), axis=(0, 1))

    s_id = jnp.zeros_like(idepth)
    s_w = jnp.zeros_like(wsum)
    s_n = jnp.zeros_like(wsum)
    for dy, dx in offs:
        nb_w = shift(wsum, dy, dx)
        nb_id = shift(idepth, dy, dx)
        has = (nb_w > 0).astype(idepth.dtype)
        s_id = s_id + has * nb_id
        s_w = s_w + has * nb_w
        s_n = s_n + has
    fill = (wsum <= 0) & (s_n > 0)
    new_id = jnp.where(fill, s_id / jnp.maximum(s_n, 1.0), idepth)
    new_w = jnp.where(fill, s_w / jnp.maximum(s_n, 1.0), wsum)
    return new_id, new_w


@partial(jax.jit, static_argnames=("shapes",))
def make_coarse_depth_maps(pt_u, pt_v, pt_idepth, pt_weight, pt_valid, dIs, shapes):
    """Build per-level (idepth, valid) maps from projected active points.

    pt_*: (P,) arrays -- pixel coords in the newest KF, projected inverse
    depth, weight sqrt(1e-3/HdiF), validity.  dIs: per-level (H,W,3) of the
    reference frame (for the color/finite check).  shapes: static tuple of
    (h, w) per level.
    """
    h0, w0 = shapes[0]
    u = jnp.clip((pt_u + 0.5).astype(jnp.int32), 0, w0 - 1)
    v = jnp.clip((pt_v + 0.5).astype(jnp.int32), 0, h0 - 1)
    wgt = jnp.where(pt_valid, pt_weight, 0.0)
    idw = jnp.zeros((h0, w0), jnp.float32).at[v, u].add(wgt * pt_idepth)
    wsum = jnp.zeros((h0, w0), jnp.float32).at[v, u].add(wgt)

    ids = [idw]
    wss = [wsum]
    for lvl in range(1, len(shapes)):
        prev_id, prev_w = ids[-1], wss[-1]
        h, w = shapes[lvl]
        # 2x2 SUM pooling (reference :409-432 sums, does not average)
        pid = prev_id[: 2 * h, : 2 * w]
        pw = prev_w[: 2 * h, : 2 * w]
        ids.append(
            pid[0::2, 0::2] + pid[0::2, 1::2] + pid[1::2, 0::2] + pid[1::2, 1::2]
        )
        wss.append(pw[0::2, 0::2] + pw[0::2, 1::2] + pw[1::2, 0::2] + pw[1::2, 1::2])

    out = []
    for lvl in range(len(shapes)):
        h, w = shapes[lvl]
        idepth, wsum = ids[lvl], wss[lvl]
        idepth, wsum = _dilate(idepth, wsum, diagonal=(lvl < 2))
        # normalize on interior [2, h-2) x [2, w-2) (reference :500-531)
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        interior = (xx >= 2) & (xx < w - 2) & (yy >= 2) & (yy < h - 2)
        idn = idepth / jnp.maximum(wsum, 1e-12)
        color_ok = jnp.isfinite(dIs[lvl][..., 0])
        valid = interior & (wsum > 0) & (idn > 0) & color_ok
        out.append((jnp.where(valid, idn, -1.0), valid))
    return tuple(out)


def pc_caps_for(shapes, settings, dense_max: int = 0):
    """Static per-level caps for the compact pc buffers.

    The 3x3 dilation bounds level-0 valid pixels by 9x the projected point
    count; levels only shrink under the 2x2 sum-pyramid (a coarse pixel
    needs a valid fine pixel).  Expected points = 1.5x the density target
    (the activation controller overshoots transiently) + the dense-frontend
    budget.  Overflow thins uniformly (see compact_pc), so a miss degrades
    accuracy smoothly instead of dropping image regions."""
    want = int(9 * (1.5 * settings.desired_point_density + dense_max))
    cap0 = max(4096, -(-want // 4096) * 4096)
    return tuple(int(min(h * w, cap0)) for h, w in shapes)


@partial(jax.jit, static_argnames=("caps",))
def compact_pc(maps, dIs, caps):
    """Extract the reference's pc buffers (CoarseTracker.h pc_u/pc_v/
    pc_idepth/pc_color, filled at :510-538) from the per-level (idepth,
    valid) maps: fixed-cap compaction of the valid pixels in row-major
    order.  The tracker then iterates ~valid-count points instead of the
    full grid (2-4%% valid at level 0 -- a 10-25x sample reduction).

    If a level's valid count exceeds its cap, the selection thins
    UNIFORMLY by rank (not a row-major prefix, which would drop the image
    bottom).  Returns per level (px, py, idepth, color, valid)."""
    out = []
    for lvl, cap in enumerate(caps):
        idm, vm = maps[lvl]
        h, w = vm.shape
        flat_v = vm.reshape(-1)
        n = jnp.sum(flat_v)
        rank = jnp.cumsum(flat_v)          # 1-based rank among valid
        scale = jnp.minimum(1.0, cap / jnp.maximum(n.astype(jnp.float32), 1.0))
        keep = flat_v & (jnp.floor(rank * scale)
                         != jnp.floor((rank - 1) * scale))
        (idx,) = jnp.nonzero(keep, size=cap, fill_value=0)
        valid = jnp.arange(cap) < jnp.minimum(n, cap)
        px = (idx % w).astype(jnp.float32)
        py = (idx // w).astype(jnp.float32)
        pid = idm.reshape(-1)[idx]
        color = dIs[lvl][..., 0].reshape(-1)[idx]
        out.append((px, py, pid, color, valid))
    return tuple(out)


# ---------------------------------------------------------------------------
# Per-level residual + GN system (fused calcRes + calcGSSSE)
# ---------------------------------------------------------------------------


def _res_and_gn(
    lvl_static, h, w,
    pc_px, pc_py,             # (N,) compact pc pixel coords
    pc_idepth, pc_valid, pc_color,
    new_quad,     # build_quad table of the (H,W,3) target stack
    fx, fy, cx, cy,
    R, t, aff_a, aff_b, b0,
    huber_th, cutoff,
):
    """Returns dict with E, num, sat, shiftT, shiftRT, H (8,8), b (8,).

    Iterates the compact pc point list (reference calcRes :891-1049 runs
    over pc_u/pc_v/pc_idepth/pc_color, NOT the pixel grid) -- ~25x fewer
    samples than the dense-map formulation at level 0."""
    idp = pc_idepth
    ray = jnp.stack([(pc_px - cx) / fx, (pc_py - cy) / fy,
                     jnp.ones_like(pc_px)], axis=-1)
    # warp: pt = R @ ray + t * id   (reference :954 uses RKi*(x,y,1)+t*id)
    pt = jnp.einsum("ij,nj->ni", R, ray, precision="highest") + t[None, :] * idp[..., None]
    iz = 1.0 / pt[..., 2]
    u = pt[..., 0] * iz
    v = pt[..., 1] * iz
    Ku = fx * u + cx
    Kv = fy * v + cy
    new_idepth = idp * iz

    inb = (Ku > 2) & (Kv > 2) & (Ku < w - 3) & (Kv < h - 3) & (new_idepth > 0)
    valid = pc_valid & inb

    hit = interp3q(new_quad, h, w, Ku, Kv)
    finite = jnp.isfinite(hit[..., 0])
    valid = valid & finite

    residual = hit[..., 0] - (aff_a * pc_color + aff_b)
    absr = jnp.abs(residual)
    hw = jnp.where(absr < huber_th, 1.0, huber_th / jnp.maximum(absr, 1e-12))

    saturated = valid & (absr > cutoff)
    inlier = valid & (absr <= cutoff)

    max_energy = 2.0 * huber_th * cutoff - huber_th * huber_th
    e_pix = jnp.where(inlier, hw * residual * residual * (2.0 - hw), 0.0)
    E = jnp.sum(e_pix) + max_energy * jnp.sum(saturated)
    num = jnp.sum(valid)
    nsat = jnp.sum(saturated)

    # GN system over inliers (J layout = calcGSSSE :852-867)
    dx = hit[..., 1] * fx
    dy = hit[..., 2] * fy
    J = jnp.stack(
        [
            new_idepth * dx,
            new_idepth * dy,
            -new_idepth * (u * dx + v * dy),
            -(u * v * dx + dy * (1.0 + v * v)),
            u * v * dy + dx * (1.0 + u * u),
            u * dy - v * dx,
            aff_a * (b0 - pc_color),
            -jnp.ones_like(u),
        ],
        axis=-1,
    )
    wmask = jnp.where(inlier, hw, 0.0)
    Jw = J * wmask[..., None]
    Jf = J.reshape(-1, 8)
    Jwf = Jw.reshape(-1, 8)
    H = jnp.einsum("pi,pj->ij", Jwf, Jf, precision="highest")
    b = jnp.einsum("pi,p->i", Jwf, residual.reshape(-1), precision="highest")
    n_warped = jnp.maximum(num - nsat, 1).astype(jnp.float32)
    H = H / n_warped
    b = b / n_warped

    out = dict(
        E=E,
        num=jnp.maximum(num, 1).astype(jnp.float32),
        sat=nsat.astype(jnp.float32) / jnp.maximum(num, 1).astype(jnp.float32),
        H=H,
        b=b,
    )

    if lvl_static == 0:
        # flow indicators (reference :961-999): translation-only and full
        # projections of the reference points, +/- t.
        def proj_shift(use_R, sign):
            Rm = R if use_R else jnp.eye(3, dtype=R.dtype)
            p = jnp.einsum("ij,nj->ni", Rm, ray, precision="highest") + sign * t[None, :] * idp[..., None]
            uu = fx * p[..., 0] / p[..., 2] + cx
            vv = fy * p[..., 1] / p[..., 2] + cy
            return (uu - pc_px) ** 2 + (vv - pc_py) ** 2

        m = pc_valid.astype(jnp.float32)
        nref = jnp.maximum(jnp.sum(m), 1.0)
        shiftT = jnp.sum(m * (proj_shift(False, 1.0) + proj_shift(False, -1.0))) / (2.0 * nref)
        shiftRT = jnp.sum(m * (proj_shift(True, 1.0) + proj_shift(True, -1.0))) / (2.0 * nref)
        out["shiftT"] = shiftT
        out["shiftRT"] = shiftRT
    else:
        out["shiftT"] = jnp.float32(0.0)
        out["shiftRT"] = jnp.float32(0.0)
    return out


def _solve_damped(H, b, lam, affine_mode: int):
    """inc = -(H + lam*diag(H))^-1 b with Jacobi preconditioning.

    affine_mode: 0 = optimize a and b, 1 = fix b, 2 = fix a, 3 = fix both
    (reference trackNewestCoarse :1138-1159).
    """
    Hl = H + lam * jnp.diag(jnp.diag(H))

    def solve_sub(Hs, bs, n):
        d = jnp.sqrt(jnp.abs(jnp.diag(Hs)) + 1e-10)
        di = 1.0 / d
        Hp = Hs * di[:, None] * di[None, :]
        bp = bs * di
        x = jnp.linalg.solve(Hp + 1e-12 * jnp.eye(n, dtype=Hs.dtype), -bp)
        return x * di

    if affine_mode == 0:
        return solve_sub(Hl, b, 8)
    if affine_mode == 3:
        inc6 = solve_sub(Hl[:6, :6], b[:6], 6)
        return jnp.concatenate([inc6, jnp.zeros(2, Hl.dtype)])
    if affine_mode == 1:  # fix b: solve 7x7 on [0..6]
        inc7 = solve_sub(Hl[:7, :7], b[:7], 7)
        return jnp.concatenate([inc7, jnp.zeros(1, Hl.dtype)])
    # fix a: swap column/row 7 into slot 6 (reference :1147-1158)
    idx = jnp.array([0, 1, 2, 3, 4, 5, 7])
    Hs = Hl[jnp.ix_(idx, idx)]
    bs = b[idx]
    inc7 = solve_sub(Hs, bs, 7)
    return jnp.concatenate(
        [inc7[:6], jnp.zeros(1, Hl.dtype), inc7[6:7]]
    )


def _se3_exp_f32(xi):
    from ..geometry import lie

    return lie.se3_exp(xi)


def make_track_fn(shapes, Ks, settings, affine_mode: int, min_level: int = 0):
    """Build the jitted pyramid tracker for a fixed geometry.

    shapes: tuple of (h, w) per level; Ks: (fx, fy, cx, cy) arrays per level.
    min_level > 0 builds a coarse-only descent (levels L-1..min_level) --
    used to triage the 26-hypothesis ladder cheaply before one full descent
    on the winner (the batched analog of the reference's per-level early
    abort, FullSystem.cpp:516-656).
    Returns track(R0, t0, ab0, ref_pc, new_dIs, exposures,
    ref_aff) -> (R, t, ab, last_res (L,), flow (2,), ok_affine).
    """
    levels = len(shapes)
    huber = settings.huber_th
    base_cutoff = settings.coarse_cutoff_th

    def run_level(lvl, R, t, ab, level_inputs):
        pc, new_dI, exps, ref_aff = level_inputs
        pc_px, pc_py, pc_id, pc_color, pc_valid = pc
        fx, fy, cx, cy = Ks[lvl]
        h, w = shapes[lvl]
        # quad-tap table built ONCE per level: the LM/cutoff while loops
        # close over it (an in-body build re-materializes every iteration)
        new_quad = build_quad(new_dI)

        def ev(R, t, ab, cutoff):
            a, b = aff_from_to(exps[0], exps[1], ref_aff[0], ref_aff[1], ab[0], ab[1])
            return _res_and_gn(
                lvl, h, w, pc_px, pc_py, pc_id, pc_valid, pc_color, new_quad,
                fx, fy, cx, cy, R, t, a, b, ref_aff[1], huber, cutoff,
            )

        # --- cutoff adaptation (reference :1104-1112) ---
        r0 = ev(R, t, ab, base_cutoff)

        def ccond(c):
            mult, r = c
            return (r["sat"] > 0.6) & (mult < 50.0)

        def cbody(c):
            mult, r = c
            mult = mult * 2.0
            return mult, ev(R, t, ab, base_cutoff * mult)

        cutoff_mult, r = jax.lax.while_loop(ccond, cbody, (jnp.float32(1.0), r0))
        cutoff = base_cutoff * cutoff_mult

        # --- LM iterations ---
        max_iter = _MAX_ITERATIONS[min(lvl, len(_MAX_ITERATIONS) - 1)]

        def lm_cond(s):
            return (s["it"] < max_iter) & (~s["done"])

        def lm_body(s):
            H, b = s["H"], s["b"]
            lam = s["lam"]
            inc = _solve_damped(H, b, lam, affine_mode)
            extrap = jnp.where(
                lam < _LAMBDA_EXTRAPOLATION_LIMIT,
                jnp.sqrt(jnp.sqrt(_LAMBDA_EXTRAPOLATION_LIMIT / lam)),
                1.0,
            )
            inc = inc * extrap
            inc = jnp.where(jnp.isfinite(inc), inc, 0.0)

            dR, dt = _se3_exp_f32(inc[:6])
            Rn = jnp.einsum("ij,jk->ik", dR, s["R"], precision="highest")
            tn = jnp.einsum("ij,j->i", dR, s["t"], precision="highest") + dt
            abn = s["ab"] + inc[6:8]

            rn = ev(Rn, tn, abn, cutoff)
            accept = (rn["E"] / rn["num"]) < (s["res"]["E"] / s["res"]["num"])

            Rn2 = jnp.where(accept, Rn, s["R"])
            tn2 = jnp.where(accept, tn, s["t"])
            abn2 = jnp.where(accept, abn, s["ab"])
            res2 = jax.tree.map(lambda a_, b_: jnp.where(accept, a_, b_), rn, s["res"])
            lam2 = jnp.where(
                accept,
                lam * 0.5,
                jnp.maximum(lam * 4.0, _LAMBDA_EXTRAPOLATION_LIMIT),
            )
            inc_norm = jnp.linalg.norm(inc * jnp.asarray(_INC_NORM_SCALE))
            done = ~(inc_norm > 1e-3)
            return dict(
                it=s["it"] + 1, R=Rn2, t=tn2, ab=abn2,
                H=res2["H"], b=res2["b"], res=res2, lam=lam2, done=done,
            )

        state = dict(
            it=jnp.int32(0), R=R, t=t, ab=ab, H=r["H"], b=r["b"], res=r,
            lam=jnp.float32(0.01), done=jnp.bool_(False),
        )
        state = jax.lax.while_loop(lm_cond, lm_body, state)
        res = state["res"]
        level_rmse = jnp.sqrt(res["E"] / res["num"])
        flow = jnp.stack([res["shiftT"], res["shiftRT"]])
        return state["R"], state["t"], state["ab"], level_rmse, flow, cutoff_mult

    def track(R0, t0, ab0, ref_pc, new_dIs, exposures, ref_aff):
        """ref_pc: tuple per level of compact_pc output (px, py, idepth,
        color, valid); new_dIs: tuple of (H,W,3)."""
        R, t, ab = R0, t0, ab0
        last_res = jnp.full((levels,), jnp.nan, jnp.float32)
        flow_out = jnp.full((2,), 1000.0, jnp.float32)
        have_repeated = jnp.bool_(False)

        for lvl in range(levels - 1, min_level - 1, -1):
            inputs = (
                ref_pc[lvl],
                new_dIs[lvl], exposures, ref_aff,
            )
            R, t, ab, rmse, flow, cmult = run_level(lvl, R, t, ab, inputs)
            need_repeat = (cmult > 1.0) & (~have_repeated)

            def do_repeat(args):
                R_, t_, ab_ = args
                R2, t2, ab2, rm2, fl2, _ = run_level(lvl, R_, t_, ab_, inputs)
                return R2, t2, ab2, rm2, fl2

            def no_repeat(args):
                R_, t_, ab_ = args
                return R_, t_, ab_, rmse, flow

            R, t, ab, rmse, flow = jax.lax.cond(need_repeat, do_repeat, no_repeat, (R, t, ab))
            have_repeated = have_repeated | need_repeat
            last_res = last_res.at[lvl].set(rmse)
            if lvl == 0:
                flow_out = flow

        # affine sanity (reference :1236-1253)
        rel_a, rel_b = aff_from_to(
            exposures[0], exposures[1], ref_aff[0], ref_aff[1], ab[0], ab[1]
        )
        ok = jnp.bool_(True)
        if affine_mode in (0, 1):  # a optimized
            ok = ok & (jnp.abs(ab[0]) < 1.2)
        if affine_mode in (0, 2):  # b optimized
            ok = ok & (jnp.abs(ab[1]) < 200.0)
        ok = ok & jnp.isfinite(last_res[min_level])
        return R, t, ab, last_res, flow_out, ok

    return track
