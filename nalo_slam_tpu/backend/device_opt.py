"""Whole-window GN optimization as ONE device program.

The host implementation in energy.py mirrors the reference's structure
(float accumulate, float64 stitch on the host).  On hardware where every
host<->device round trip costs tens of milliseconds, the per-iteration
host solve dominates; this module runs the ENTIRE optimize() loop --
linearize, state machine, frame-energy threshold, 13x13 pair accumulation,
Schur accumulation, stitch, damped solve, nullspace projection of the
step, resubstitution, state update and convergence test -- inside a single
jitted lax.while_loop.  One device call per keyframe.

Everything is masked-dynamic in the number of frames (one compile serves
all window sizes).  The 68x68 solve runs in f32 with the reference's own
SVec Jacobi conditioning (solveSystemF :894-899); the long-lived
marginalization prior HM/bM stays on the host in float64 and enters as a
constant of the loop, so f32 noise cannot accumulate across keyframes.

Numerical parity with the float64 host path is covered by
tests/test_device_opt.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CPARS, SCALE_A, SCALE_B, SCALE_XI_TRANS
from ..geometry import lie
from . import ba_kernels as K
from ..ops import interp as _interp
from .ba_kernels import RES_IN, RES_OOB, RES_OUTLIER

RES_NONE = 3


def _pair_poses_fixed(states, evalR, evalt):
    dR, dt = lie.se3_exp(states[:, :6])
    Rw = jnp.einsum("fij,fjk->fik", dR, evalR, precision="highest")
    tw = jnp.einsum("fij,fj->fi", dR, evalt, precision="highest") + dt
    Rc = jnp.swapaxes(Rw, -1, -2)
    tc = -jnp.einsum("fij,fj->fi", Rc, tw, precision="highest")
    Rl = jnp.einsum("tij,hjk->htik", Rw, Rc, precision="highest")
    # tl[h,t] = R_t @ tc_h + tw_t
    tl = jnp.einsum("tij,hj->hti", Rw, tc, precision="highest") + tw[None, :, :]
    return Rw, tw, Rl, tl


def _aff_pair_dev(exp_f, exp_t, a_f, b_f, a_t, b_t):
    ef = jnp.where(exp_f == 0, 1.0, exp_f)
    et = jnp.where(exp_t == 0, 1.0, exp_t)
    a = jnp.exp(a_t - a_f) * et / ef
    return a, b_t - a * b_f


def _precalc_dev(states, evalR, evalt, calib_value, exposures):
    """PRE_KRKi / PRE_Kt / PRE_aff at the current states (device)."""
    F = states.shape[0]
    _, _, Rl, tl = _pair_poses_fixed(states, evalR, evalt)
    fx, fy, cx, cy = calib_value[0], calib_value[1], calib_value[2], calib_value[3]
    Km = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    Km = Km.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)
    Ki = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    Ki = Ki.at[0, 0].set(1 / fx).at[1, 1].set(1 / fy).at[0, 2].set(-cx / fx).at[1, 2].set(-cy / fy)
    KRKi = jnp.einsum("ij,htjk,kl->htil", Km, Rl, Ki, precision="highest")
    Kt = jnp.einsum("ij,htj->hti", Km, tl, precision="highest")
    a_h = states[:, 6]
    b_h = states[:, 7]
    aff_a, aff_b = _aff_pair_dev(
        exposures[:, None], exposures[None, :],
        a_h[:, None], b_h[:, None], a_h[None, :], b_h[None, :],
    )
    aff = jnp.stack([aff_a, aff_b], axis=-1)
    return KRKi, Kt, aff


def _stitch_top_dev(acc, adH, adT, F):
    """Vectorized stitchDouble; returns blocks: HCC (4,4), HfC (F,8,4),
    Hpp (F,F,8,8) symmetric-complete, bC (4,), bf (F,8)."""
    A = acc.reshape(F, F, 13, 13)
    A8 = A[..., 4:12, 4:12]
    A8C = A[..., 4:12, 0:4]
    ACC = jnp.sum(A[..., 0:4, 0:4], axis=(0, 1))
    b8 = A[..., 4:12, 12]
    bc = jnp.sum(A[..., 0:4, 12], axis=(0, 1))

    diag_h = jnp.einsum("htij,htjk,htlk->hil", adH, A8, adH, precision="highest")
    diag_t = jnp.einsum("htij,htjk,htlk->til", adT, A8, adT, precision="highest")
    off = jnp.einsum("htij,htjk,htlk->htil", adH, A8, adT, precision="highest")
    eyeF = jnp.eye(F, dtype=acc.dtype)
    S = off.at[jnp.arange(F), jnp.arange(F)].add(diag_h + diag_t)
    # symmetric completion (reference :213-224): M[h,t] = S[h,t] + S[t,h]^T
    # off-diagonal; the diagonal blocks are already symmetric and counted once
    bT = S.transpose(1, 0, 3, 2)
    Hpp = S + bT - eyeF[:, :, None, None] * S

    HfC = (
        jnp.einsum("htij,htjk->hik", adH, A8C, precision="highest")
        + jnp.einsum("htij,htjk->tik", adT, A8C, precision="highest")
    )
    bf = (
        jnp.einsum("htij,htj->hi", adH, b8, precision="highest")
        + jnp.einsum("htij,htj->ti", adT, b8, precision="highest")
    )
    return ACC, HfC, Hpp, bc, bf


def _stitch_sc_dev(accD, accE, accEB, accHcc, accbc, adH, adT, F):
    E1 = jnp.einsum("ijab,ijkbc,ikdc->iad", adH, accD, adH, precision="highest")
    E2 = jnp.einsum("ijab,ijkbc,ikdc->jkad", adT, accD, adT, precision="highest")
    E3 = jnp.einsum("ijab,ijkbc,ikdc->jiad", adT, accD, adH, precision="highest")
    E4 = jnp.einsum("ijab,ijkbc,ikdc->ikad", adH, accD, adT, precision="highest")
    Hpp = E2 + E3 + E4
    Hpp = Hpp.at[jnp.arange(F), jnp.arange(F)].add(E1)
    HfC = (
        jnp.einsum("ijab,ijbc->iac", adH, accE, precision="highest")
        + jnp.einsum("ijab,ijbc->jac", adT, accE, precision="highest")
    )
    bf = (
        jnp.einsum("ijab,ijb->ia", adH, accEB, precision="highest")
        + jnp.einsum("ijab,ijb->ja", adT, accEB, precision="highest")
    )
    return accHcc, HfC, Hpp, accbc, bf


def _dense(HCC, HfC, Hpp, F):
    n = CPARS + 8 * F
    top = jnp.concatenate([HCC, HfC.reshape(8 * F, CPARS).T], axis=1)
    bottom = jnp.concatenate(
        [HfC.reshape(8 * F, CPARS),
         jnp.swapaxes(Hpp, 1, 2).reshape(8 * F, 8 * F)], axis=1
    )
    return jnp.concatenate([top, bottom], axis=0)


def _vec(bC, bf):
    return jnp.concatenate([bC, bf.reshape(-1)])


def make_device_optimizer(settings, F: int, P: int):
    """Factory: returns optimize(inputs dict) -> outputs dict, fully jitted."""
    s = settings
    lam = 1e-5  # SOLVER_FIX_LAMBDA
    n = CPARS + 8 * F
    ab_zero = jnp.asarray(
        [0.0 if s.affine_opt_mode_a < 0 else 1.0,
         0.0 if s.affine_opt_mode_b < 0 else 1.0], jnp.float32)

    def linearize(images, images_quad, pts, res, jstore, states, calib, inp,
                  f_eth):
        # `calib` is the CARRIED calib of the GN loop, not the start-of-KF
        # inp["calib_value"]: the reference's doStepFromBackup updates Hcalib
        # and setPrecalcValues() before the next linearizeAll, so every
        # in-loop linearize must see the stepped intrinsics (this also makes
        # the fused tail's column-restricted relinearize exact -- see
        # make_device_optimizer_fused).
        KRKi, Kt, aff = _precalc_dev(states, inp["evalR"], inp["evalt"],
                                     calib, inp["exposures"])
        out = K.linearize_residuals(
            images,
            pts["u"], pts["v"], pts["idepth"], pts["idepth_zero"],
            pts["color"], pts["weights"], pts["host"], pts["energy_th"],
            res["exists"], res["state"],
            PRE_R0=inp["PRE_R0"], PRE_t0=inp["PRE_t0"],
            PRE_KRKi=KRKi, PRE_Kt=Kt, PRE_aff=aff, PRE_b0=inp["aff0_b"],
            f_energy_th=f_eth,
            calib=calib,
            outlier_th_sum=s.outlier_th_sum_component,
            huber_th=s.huber_th,
            ab_zero=ab_zero,
            target_quad=images_quad,
        )
        return out

    def frame_energy_th(out, res, newest, f_eth):
        """setNewFrameEnergyTH on device."""
        act = res["exists"] & ~res["linearized"]
        col = jax.lax.dynamic_index_in_dim(jnp.swapaxes(out["energy_raw"], 0, 1), newest, 0, keepdims=False)
        mcol = jax.lax.dynamic_index_in_dim(jnp.swapaxes(act, 0, 1), newest, 0, keepdims=False)
        mcol = mcol & (jax.lax.dynamic_index_in_dim(jnp.swapaxes(res["state"], 0, 1), newest, 0, keepdims=False) != RES_OOB)
        cnt = jnp.sum(mcol)
        vals = jnp.where(mcol, col, jnp.inf)
        srt = jnp.sort(vals)
        idx = jnp.clip((s.frame_energy_th_n * cnt).astype(jnp.int32),
                       0, P - 1)
        nth = jnp.where(cnt > 0, srt[idx], 12.0 * 12.0 * 8.0)
        th = jnp.sqrt(nth) * s.frame_energy_th_fac_median
        th = 26.0 * s.frame_energy_th_const_weight + th * (1 - s.frame_energy_th_const_weight)
        th = th * th * s.overall_energy_th_weight**2
        return f_eth.at[newest].set(th)

    def apply_res(out, res, jstore):
        act = res["exists"] & ~res["linearized"]
        upd = act & (res["state"] != RES_OOB)
        new_state = jnp.where(upd, out["new_state"], res["state"])
        new_active = jnp.where(act, new_state == RES_IN, res["active"])
        res2 = dict(res, state=new_state, active=new_active,
                    energy=jnp.where(upd, out["energy"], res["energy"]))
        updj = act & (new_state == RES_IN)
        jstore2 = {}
        for k2 in ("Jpdxi", "Jpdc", "Jpdd", "JIdx", "JabF", "resF",
                   "JIdx2", "JabJIdx", "Jab2"):
            extra = (1,) * (out[k2].ndim - 2)
            jstore2[k2] = jnp.where(updj.reshape(updj.shape + extra), out[k2], jstore[k2])
        jstore2["res_toZero"] = jstore["res_toZero"]
        return res2, jstore2

    def delta_pair(states, inp):
        d = (states - inp["state_zero"])[:, :8]
        return (
            jnp.einsum("hk,htkj->htj", d, inp["adH"], precision="highest")
            + jnp.einsum("tk,htkj->htj", d, inp["adT"], precision="highest")
        )

    def solve_iteration(it, states, calib_value, pts, res, jstore, inp):
        dpair = delta_pair(states, inp)
        c_delta = calib_value - inp["calib_zero"]
        p_delta = pts["idepth"] - pts["idepth_zero"]

        maskA = res["exists"] & ~res["linearized"] & res["active"]

        accA, nresA, HddA, bdA, HcdA = K.accumulate_top(
            jstore, jstore["resF"], maskA, pts["host"], F)

        ACC_A, HfC_A, Hpp_A, bC_A, bf_A = _stitch_top_dev(accA, inp["adH"], inp["adT"], F)
        # The L (FEJ-linearized) system is structurally EMPTY in the live
        # window: fixLinearizationF is marg-only and marginalization drops
        # the residual, so r_linearized is false for every window residual
        # (guarded by an assert in _wo_gn_prepare).  Its accumulation --
        # a second accumulate_top + res_approx per iteration, ~12 ms at
        # preset-0 -- reduces to the prior terms below over zeros.
        ACC_L = jnp.zeros_like(ACC_A)
        HfC_L = jnp.zeros_like(HfC_A)
        Hpp_L = jnp.zeros_like(Hpp_A)
        bC_L = jnp.zeros_like(bC_A)
        bf_L = jnp.zeros_like(bf_A)
        HddL = jnp.zeros_like(HddA)
        bdL = jnp.zeros_like(bdA)
        HcdL = jnp.zeros_like(HcdA)
        maskL = jnp.zeros_like(maskA)

        # priors on the L system (stitchDouble usePrior branch)
        fdelta = states[:, :8]  # delta_prior (prior zero point is 0)
        ACC_L = ACC_L + jnp.diag(inp["c_prior"])
        bC_L = bC_L + inp["c_prior"] * c_delta
        Hpp_L = Hpp_L.at[jnp.arange(F), jnp.arange(F)].add(
            jax.vmap(jnp.diag)(inp["frame_prior"]))
        bf_L = bf_L + inp["frame_prior"] * fdelta

        # Schur
        mask = maskA | maskL
        ngood = jnp.sum(mask, axis=1)
        Hdd = HddA + HddL + pts["prior"]
        Hdd = jnp.maximum(Hdd, 1e-10)
        HdiF = jnp.where(ngood > 0, 1.0 / Hdd, 0.0)
        bdSum = bdA + bdL + pts["prior"] * p_delta
        bdSum = jnp.where(ngood > 0, bdSum, 0.0)
        Hcd = HcdA + HcdL
        JpJdF = K.compute_JpJdF(jstore, F)
        accD, accE, accEB, accHcc, accbc = K.accumulate_sc(
            JpJdF, Hcd, bdSum, HdiF, mask, pts["host"], F)
        ACC_S, HfC_S, Hpp_S, bC_S, bf_S = _stitch_sc_dev(
            accD, accE, accEB, accHcc, accbc, inp["adH"], inp["adT"], F)

        delta_st = jnp.concatenate([c_delta, (states - inp["state_zero"])[:, :8].reshape(-1)])
        bM_top = inp["bM"] + inp["HM"] @ delta_st

        HFinal = _dense(ACC_A + ACC_L, HfC_A + HfC_L, Hpp_A + Hpp_L, F) + inp["HM"]
        bFinal = _vec(bC_A + bC_L, bf_A + bf_L) + bM_top - _vec(bC_S, bf_S)
        Hsc = _dense(ACC_S, HfC_S, Hpp_S, F)

        dg = jnp.arange(n)
        HFinal = HFinal.at[dg, dg].multiply(1 + lam)
        HFinal = HFinal - Hsc * (1.0 / (1 + lam))

        # mask out inactive frames
        m = jnp.concatenate(
            [jnp.ones(CPARS, bool),
             jnp.repeat(inp["frame_valid"], 8)]
        )
        mf = m.astype(HFinal.dtype)
        HFinal = HFinal * mf[:, None] * mf[None, :] + jnp.diag(1.0 - mf)
        bFinal = bFinal * mf

        SVecI = 1.0 / jnp.sqrt(jnp.abs(jnp.diag(HFinal)) + 10.0)
        Hs = HFinal * SVecI[:, None] * SVecI[None, :]
        bs = SVecI * bFinal
        xs = jnp.linalg.solve(Hs, bs)
        # one round of iterative refinement: the reference solves this
        # system in DOUBLE (Eigen MatXX, EnergyFunctional.cpp:776-914);
        # in f32 the factorization's backward error on the Jacobi-scaled
        # system is enough to throw the weakly-constrained affine
        # directions at drift-stressed keyframes (see PARITY.md round-5:
        # the f64 host oracle rides through the same KF the f32 solve
        # explodes on).  Refinement recovers most of the double solve at
        # the cost of one extra 60x60 matvec + solve.
        rres = bs - Hs @ xs
        xs = xs + jnp.linalg.solve(Hs, rres)
        x = SVecI * xs
        x = jnp.where(it >= 2, x - inp["NNpiTS"] @ x, x)  # ORTH_X_LATER
        x = jnp.where(jnp.isfinite(x), x, 0.0)

        # resubstitute
        x_c = x[:CPARS]
        xf = x[CPARS:].reshape(F, 8)
        xAd = (
            jnp.einsum("hk,htkj->htj", xf, inp["adH"], precision="highest")
            + jnp.einsum("tk,htkj->htj", xf, inp["adT"], precision="highest")
        )
        steps = K.resubstitute(x_c, xAd, JpJdF, mask, pts["host"],
                               Hcd, bdSum, HdiF, ngood, F)

        new_calib = calib_value - x_c
        fstep = jnp.concatenate([-xf, jnp.zeros((F, 2), x.dtype)], axis=1)
        new_states = states + fstep
        newid = pts["idepth"] + steps
        pts2 = dict(pts, idepth=newid, idepth_zero=newid,
                    idepth_hessian=jnp.where(ngood > 0, Hdd, 0.0))

        # convergence (doStepFromBackup :290-298), reference scaled units
        nfr = jnp.maximum(jnp.sum(inp["frame_valid"]), 1).astype(x.dtype)
        sumA = jnp.sum(fstep[:, 6] ** 2) / (nfr * SCALE_A**2)
        sumB = jnp.sum(fstep[:, 7] ** 2) / (nfr * SCALE_B**2)
        sumT = jnp.sum(fstep[:, 0:3] ** 2) / (nfr * SCALE_XI_TRANS**2)
        sumR = jnp.sum(fstep[:, 3:6] ** 2) / nfr
        act_pts = pts["active"]
        nid = jnp.maximum(jnp.sum(act_pts), 1).astype(x.dtype)
        sumNID = jnp.sum(jnp.abs(jnp.where(act_pts, pts["idepth"], 0.0))) / nid
        th = s.th_opt_iterations
        canbreak = (
            (jnp.sqrt(sumA) < 0.0005 * th)
            & (jnp.sqrt(sumB) < 0.00005 * th)
            & (jnp.sqrt(sumR) < 0.00005 * th)
            & (jnp.sqrt(sumT) * sumNID < 0.00005 * th)
        )
        return new_states, new_calib, pts2, nresA, canbreak

    @jax.jit
    def optimize(images, pts, res, jstore, states0, calib0, f_eth0, inp,
                 max_iters, newest, images_quad=None):
        def reset_oob(res):
            act = res["exists"] & ~res["linearized"]
            return dict(res, state=jnp.where(act, RES_IN, res["state"]))

        res0 = reset_oob(res)
        # ONE quad-tap table build per program: the loop body closes over
        # it, so XLA hoists it out of the while (an in-body build would
        # re-materialize ~20 ms/iteration at KITTI-class shapes).  Callers
        # holding the window's device-resident quad store (energy.py
        # WindowOptimizer.quads -- built once per KF insert) pass it in
        # and skip even that one per-program build.
        if images_quad is None:
            images_quad = jax.vmap(_interp.build_quad)(images)
        out0 = linearize(images, images_quad, pts, res0, jstore, states0,
                         calib0, inp, f_eth0)
        f_eth1 = frame_energy_th(out0, res0, newest, f_eth0)
        res1, jstore1 = apply_res(out0, res0, jstore)

        def cond(c):
            return (c["it"] < max_iters) & ~(c["done"] & (c["it"] >= s.min_opt_iterations))

        def body(c):
            new_states, new_calib, pts2, nresA, canbreak = solve_iteration(
                c["it"], c["states"], c["calib"], c["pts"], c["res"], c["jstore"], inp
            )
            out = linearize(images, images_quad, pts2, c["res"],
                            c["jstore"], new_states, new_calib, inp,
                            c["f_eth"])
            f_eth = frame_energy_th(out, c["res"], newest, c["f_eth"])
            res2, jstore2 = apply_res(out, c["res"], c["jstore"])
            new = dict(it=c["it"] + 1, states=new_states, calib=new_calib,
                       pts=pts2, res=res2, jstore=jstore2, f_eth=f_eth,
                       done=canbreak, nresA=nresA)
            # freeze once converged or out of budget: a no-op unbatched
            # (cond already exits), but under vmap the while_loop runs
            # until EVERY batch element finishes -- without this,
            # already-finished windows would keep iterating and diverge
            # from their unbatched result (max_iters may also differ per
            # element when the multi-sequence executor batches windows of
            # different sizes)
            frozen = (c["done"] & (c["it"] >= s.min_opt_iterations)) | (
                c["it"] >= max_iters)

            def sel(new_v, old_v):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        jnp.reshape(frozen, (1,) * n.ndim), o, n),
                    new_v, old_v)

            return {k: (new[k] if k == "it" else sel(new[k], c[k]))
                    for k in new}

        carry = dict(it=jnp.int32(0), states=states0, calib=calib0, pts=pts,
                     res=res1, jstore=jstore1, f_eth=f_eth1,
                     done=jnp.bool_(False), nresA=jnp.int32(1))
        carry = jax.lax.while_loop(cond, body, carry)
        return carry

    return optimize


def make_final_fix(settings, F: int, P: int):
    """One device call for the post-loop linearizeAll(true): relinearize at
    the new linearization point, apply, fix res_toZero, return energies and
    the newest-frame center projections."""
    s = settings
    ab_zero = jnp.asarray(
        [0.0 if s.affine_opt_mode_a < 0 else 1.0,
         0.0 if s.affine_opt_mode_b < 0 else 1.0], jnp.float32)

    @jax.jit
    def final_fix(images, pts, res, jstore, states, calib_value, f_eth, inp,
                  dpair, newest):
        KRKi, Kt, aff = _precalc_dev(states, inp["evalR"], inp["evalt"],
                                     calib_value, inp["exposures"])
        out = K.linearize_residuals(
            images,
            pts["u"], pts["v"], pts["idepth"], pts["idepth_zero"],
            pts["color"], pts["weights"], pts["host"], pts["energy_th"],
            res["exists"], res["state"],
            PRE_R0=inp["PRE_R0"], PRE_t0=inp["PRE_t0"],
            PRE_KRKi=KRKi, PRE_Kt=Kt, PRE_aff=aff, PRE_b0=inp["aff0_b"],
            f_energy_th=f_eth,
            calib=calib_value,
            outlier_th_sum=s.outlier_th_sum_component,
            huber_th=s.huber_th,
            ab_zero=ab_zero,
        )
        act = res["exists"] & ~res["linearized"]
        upd = act & (res["state"] != RES_OOB)
        new_state = jnp.where(upd, out["new_state"], res["state"])
        new_active = jnp.where(act, new_state == RES_IN, res["active"])
        energy = jnp.where(upd, out["energy"], res["energy"])
        updj = act & (new_state == RES_IN)
        jstore2 = {}
        for k2 in ("Jpdxi", "Jpdc", "Jpdd", "JIdx", "JabF", "resF",
                   "JIdx2", "JabJIdx", "Jab2"):
            extra = (1,) * (out[k2].ndim - 2)
            jstore2[k2] = jnp.where(updj.reshape(updj.shape + extra), out[k2], jstore[k2])

        # fixLinearizationF for fresh IN residuals
        c_delta = calib_value - inp["calib_zero"]
        p_delta = pts["idepth"] - pts["idepth_zero"]
        dp = dpair[pts["host"]]
        Jp_dx = (
            jnp.einsum("pfk,pfk->pf", jstore2["Jpdxi"][:, :, 0, :], dp[..., :6])
            + jnp.einsum("pfk,k->pf", jstore2["Jpdc"][:, :, 0, :], c_delta)
            + jstore2["Jpdd"][..., 0] * p_delta[:, None]
        )
        Jp_dy = (
            jnp.einsum("pfk,pfk->pf", jstore2["Jpdxi"][:, :, 1, :], dp[..., :6])
            + jnp.einsum("pfk,k->pf", jstore2["Jpdc"][:, :, 1, :], c_delta)
            + jstore2["Jpdd"][..., 1] * p_delta[:, None]
        )
        rtz = (
            jstore2["resF"]
            - jstore2["JIdx"][:, :, 0, :] * Jp_dx[..., None]
            - jstore2["JIdx"][:, :, 1, :] * Jp_dy[..., None]
            - jstore2["JabF"][:, :, 0, :] * dp[..., 6:7]
            - jstore2["JabF"][:, :, 1, :] * dp[..., 7:8]
        )
        fix = updj
        jstore2["res_toZero"] = jnp.where(fix[..., None], rtz, jstore["res_toZero"])
        # residuals stay NON-linearized: the reference re-linearizes every
        # window residual fresh each KF ("0 lin res"); fixLinearizationF is
        # marg-only.  res_toZero above is still stored for the marg fold.
        new_linearized = res["linearized"]
        # drop active residuals that did not make it
        bad = act & (new_state != RES_IN)
        exists = res["exists"] & ~bad
        new_state = jnp.where(bad, RES_NONE, new_state)
        new_active = new_active & ~bad

        act_energy = jnp.sum(jnp.where(act, energy, 0.0))
        nres_in = jnp.sum(act & (new_state == RES_IN))
        center_newest = jax.lax.dynamic_index_in_dim(
            jnp.swapaxes(out["center_proj"], 0, 1), newest, 0, keepdims=False
        )
        res2 = dict(res, exists=exists, state=new_state, active=new_active,
                    linearized=new_linearized, energy=energy)
        # single-pull encodings: residual flags as a bitfield, scalars packed
        res_bits = (
            exists.astype(jnp.uint8)
            + (new_state.astype(jnp.uint8) << 1)      # 2 bits
            + (new_active.astype(jnp.uint8) << 3)
            + (new_linearized.astype(jnp.uint8) << 4)
        )
        small = jnp.concatenate([
            act_energy[None].astype(jnp.float32),
            nres_in[None].astype(jnp.float32),
        ])
        return res2, jstore2, res_bits, small, center_newest

    return final_fix


# ---------------------------------------------------------------------------
# Fused tail: eval-point reset + adjoint recompute + final relinearization
# inside the same device program (saves one call + its pulls per keyframe).
# ---------------------------------------------------------------------------


def _adjoints_dev(evalR, evalt, state_zero, exposures, frame_valid):
    """setAdjointsF on device (reference EnergyFunctional.cpp:46-106)."""
    F = evalR.shape[0]
    # h2t = evalPT_t * evalPT_h^-1
    Rc = jnp.swapaxes(evalR, -1, -2)
    tc = -jnp.einsum("fij,fj->fi", Rc, evalt, precision="highest")
    Rl = jnp.einsum("tij,hjk->htik", evalR, Rc, precision="highest")
    tl = jnp.einsum("tij,hj->hti", evalR, tc, precision="highest") + evalt[None, :, :]
    adj = lie.se3_adj(Rl, tl)                       # (F, F, 6, 6)
    a0 = state_zero[:, 6]
    b0 = state_zero[:, 7]
    aff_a, _ = _aff_pair_dev(
        exposures[:, None], exposures[None, :],
        a0[:, None], b0[:, None], a0[None, :], b0[None, :],
    )
    eye8 = jnp.broadcast_to(jnp.eye(8, dtype=evalR.dtype), (F, F, 8, 8))
    AH = eye8.at[:, :, :6, :6].set(-jnp.swapaxes(adj, -1, -2))
    AH = AH.at[:, :, 6, 6].set(aff_a)
    AH = AH.at[:, :, 7, 7].set(aff_a)
    AT = eye8.at[:, :, 6, 6].set(-aff_a)
    AT = AT.at[:, :, 7, 7].set(-1.0)
    m = frame_valid.astype(evalR.dtype)
    pair = m[:, None, None, None] * m[None, :, None, None]
    return AH * pair, AT * pair, Rl, tl


_MARG_CACHE: dict = {}


def make_marg_points(settings, F: int, P: int):
    """marginalizePointsF's heavy math (reference EnergyFunctional.cpp:
    615-676) as ONE device program with ONE flat pull: mode-2 top
    accumulation, Schur accumulation and both stitches run on device and
    only the stitched (4+8F)^2 H and (4+8F) b come back.  Replaces the
    host path's ~10 separate D2H pulls (each a ~30 ms tunnel round trip)."""
    key = (id(settings), F, P)
    hit = _MARG_CACHE.get(key)
    if hit is not None and hit[0] is settings:
        return hit[1]

    @jax.jit
    def marg(jstore, mask, host, prior, adH, adT):
        acc, nres, Hdd_, bd, Hcd = K.accumulate_top(
            jstore, jstore["res_toZero"], mask, host, F)
        ACC, HfC, Hpp, bC, bf = _stitch_top_dev(acc, adH, adT, F)
        M = _dense(ACC, HfC, Hpp, F)
        Mb = _vec(bC, bf)

        ngood = jnp.sum(mask, axis=1)
        Hdd = jnp.maximum(Hdd_ + prior, 1e-10)
        HdiF = jnp.where(ngood > 0, 1.0 / Hdd, 0.0)
        bdSum = jnp.where(ngood > 0, bd, 0.0)
        JpJdF = K.compute_JpJdF(jstore, F)
        accD, accE, accEB, accHcc, accbc = K.accumulate_sc(
            JpJdF, Hcd, bdSum, HdiF, mask, host, F)
        ACCs, HfCs, Hpps, bCs, bfs = _stitch_sc_dev(
            accD, accE, accEB, accHcc, accbc, adH, adT, F)
        Msc = _dense(ACCs, HfCs, Hpps, F)
        Mbsc = _vec(bCs, bfs)
        H = M - Msc
        b = Mb - Mbsc
        return jnp.concatenate([H.reshape(-1), b])

    _MARG_CACHE[key] = (settings, marg)
    return marg


_FUSED_CACHE: dict = {}


def gn_flat_layout(F: int, P: int):
    """Field layout of the flat f32 H2D push feeding the fused GN program.

    Only the per-KF DYNAMIC state rides in f32 here.  The residual flag
    grids travel as a separate packed-uint8 push (gn_u8_layout: 1 byte
    instead of 4 f32 per residual slot), and the per-point STATIC data
    (u/v/color/weights/energy_th -- written once at insertion) lives
    device-resident (WindowOptimizer._pts_static) and is never re-pushed.
    At the preset-0 operating point (P=16384, F=8) this cuts the per-KF
    H2D volume from ~3.8 MB to ~0.6 MB -- on the ~10-20 MB/s tunneled
    link that is the difference between ~250 ms and ~40 ms of transfer."""
    n = CPARS + 8 * F
    fields = [
        ("idepth", (P,)), ("idepth_zero", (P,)),
        ("prior", (P,)), ("idepth_hessian", (P,)),
        ("states0", (F, 10)), ("calib0", (4,)), ("f_eth0", (F,)),
        ("evalR", (F, 3, 3)), ("evalt", (F, 3)), ("state_zero", (F, 10)),
        ("exposures", (F,)), ("aff0_b", (F,)), ("frame_prior", (F, 8)),
        ("frame_valid", (F,)),
        ("PRE_R0", (F, F, 3, 3)), ("PRE_t0", (F, F, 3)),
        ("adH", (F, F, 8, 8)), ("adT", (F, F, 8, 8)),
        ("HM", (n, n)), ("bM", (n,)), ("NNpiTS", (n, n)),
        ("calib_value", (4,)), ("calib_zero", (4,)), ("c_prior", (4,)),
    ]
    offsets = {}
    o = 0
    for name, shape in fields:
        sz = int(np.prod(shape))
        offsets[name] = (o, shape)
        o += sz
    return offsets, o


def gn_u8_layout(F: int, P: int):
    """uint8 push: [res_bits (P,F) | active (P,) | host (P,)].
    res_bits bit layout matches the pull side: exists | state<<1 |
    active<<3 | linearized<<4."""
    return P * F + P + P


def pack_res_u8(pts, F, P):
    """Host-side uint8 packing of the residual grids + active/host."""
    bits = (
        pts.r_exists.astype(np.uint8)
        + (pts.r_state.astype(np.uint8) << 1)
        + (pts.r_active.astype(np.uint8) << 3)
        + (pts.r_linearized.astype(np.uint8) << 4)
    )
    return np.concatenate([
        bits.reshape(-1),
        pts.active.astype(np.uint8),
        pts.host.astype(np.uint8),
    ])


def _gn_unflatten(flat, flat_u8, pts_static, r_energy, F, P):
    """Reassemble (pts, res, states0, calib0, f_eth0, inp) inside the jit
    from the f32 push + u8 push + device-resident static point store."""
    offsets, _ = gn_flat_layout(F, P)

    def g(name, dtype=None):
        o, shape = offsets[name]
        a = jax.lax.dynamic_slice(flat, (o,), (int(np.prod(shape)),)).reshape(shape)
        return a if dtype is None else a.astype(dtype)

    bits = jax.lax.dynamic_slice(flat_u8, (0,), (P * F,)).reshape(P, F)
    active = jax.lax.dynamic_slice(flat_u8, (P * F,), (P,))
    host = jax.lax.dynamic_slice(flat_u8, (P * F + P,), (P,))
    pts = dict(
        pts_static,
        idepth=g("idepth"), idepth_zero=g("idepth_zero"),
        host=host.astype(jnp.int32), prior=g("prior"),
        active=active.astype(bool), idepth_hessian=g("idepth_hessian"),
    )
    res = dict(
        exists=(bits & 1).astype(bool),
        state=((bits >> 1) & 3).astype(jnp.int32),
        active=((bits >> 3) & 1).astype(bool),
        linearized=((bits >> 4) & 1).astype(bool),
        energy=r_energy,
    )
    inp = dict(
        evalR=g("evalR"), evalt=g("evalt"), state_zero=g("state_zero"),
        exposures=g("exposures"), aff0_b=g("aff0_b"),
        frame_prior=g("frame_prior"), frame_valid=g("frame_valid", bool),
        PRE_R0=g("PRE_R0"), PRE_t0=g("PRE_t0"), adH=g("adH"), adT=g("adT"),
        HM=g("HM"), bM=g("bM"), NNpiTS=g("NNpiTS"),
        calib_value=g("calib_value"), calib_zero=g("calib_zero"),
        c_prior=g("c_prior"),
    )
    return pts, res, g("states0"), g("calib0"), g("f_eth0"), inp


@jax.jit
def scatter_pts_static(dev, idx, u, v, color, weights, energy_th):
    """Scatter freshly inserted points' static rows into the
    device-resident store.  idx rows padded with P (out of bounds) are
    dropped by the scatter mode."""
    return dict(
        dev,
        u=dev["u"].at[idx].set(u, mode="drop"),
        v=dev["v"].at[idx].set(v, mode="drop"),
        color=dev["color"].at[idx].set(color, mode="drop"),
        weights=dev["weights"].at[idx].set(weights, mode="drop"),
        energy_th=dev["energy_th"].at[idx].set(energy_th, mode="drop"),
    )


def _merge_activation(pts, res, r_energy, act_flat, imm, act_pos, F, M, P_eff):
    """Adopt an activation program's results into the (unflattened) GN
    inputs ON DEVICE -- the overlapped keyframe path (full_system
    `overlap_activation`): the host dispatches activation, immediately
    dispatches the GN with this merge prepended, and does its mirror
    bookkeeping while both run; the ~30 ms activation pull round-trip
    leaves the KF critical path.

    act_flat: activation_run's flat output [n_cand, n_acc | valid(F*M) |
    slot_a(A) | packed(A*(2+F))].  imm: the device-resident immature
    static store (u/v/color/weights/energy_th, all (F*M,)-shaped).
    act_pos: (A,) int32 -- target ROW for the r-th accepted candidate in
    the *rank-by-host* order, padded with P_eff beyond the assignable
    budget.  The rank ordering reproduces the host adopt's slot
    assignment exactly (host-frame groups in slot order), so the merged
    GN inputs are bit-identical to the sequential adopt-then-dispatch
    path (pinned by tests/test_overlap_act.py)."""
    A = act_pos.shape[0]
    o = 2 + F * M
    slot_a = jax.lax.dynamic_slice(act_flat, (o,), (A,))
    packed = jax.lax.dynamic_slice(act_flat, (o + A,), (A * (2 + F),)
                                   ).reshape(A, 2 + F)
    ok = (slot_a >= 0) & (packed[:, 1] > 0.5)
    sidx = jnp.clip(slot_a.astype(jnp.int32), 0, F * M - 1)
    host_a = sidx // M
    # rank accepted candidates by host frame (stable): rank r -> the r-th
    # free slot, matching the host's per-host-group insert order
    key = jnp.where(ok, host_a, F)
    order = jnp.argsort(key, stable=True)
    rank_of = jnp.zeros(A, jnp.int32).at[order].set(
        jnp.arange(A, dtype=jnp.int32))
    tgt = jnp.where(ok, act_pos[jnp.clip(rank_of, 0, A - 1)], P_eff)

    idepth_n = packed[:, 0]
    pts2 = dict(
        pts,
        idepth=pts["idepth"].at[tgt].set(idepth_n, mode="drop"),
        idepth_zero=pts["idepth_zero"].at[tgt].set(idepth_n, mode="drop"),
        prior=pts["prior"].at[tgt].set(0.0, mode="drop"),
        idepth_hessian=pts["idepth_hessian"].at[tgt].set(0.0, mode="drop"),
        active=pts["active"].at[tgt].set(True, mode="drop"),
        host=pts["host"].at[tgt].set(host_a, mode="drop"),
        u=pts["u"].at[tgt].set(imm["u"][sidx], mode="drop"),
        v=pts["v"].at[tgt].set(imm["v"][sidx], mode="drop"),
        color=pts["color"].at[tgt].set(imm["color"][sidx], mode="drop"),
        weights=pts["weights"].at[tgt].set(imm["weights"][sidx], mode="drop"),
        energy_th=pts["energy_th"].at[tgt].set(imm["energy_th"][sidx],
                                               mode="drop"),
    )
    # residual wiring (energy.add_residuals): exists+IN to every window
    # frame the activation LM kept (already masked to active != host
    # targets in _activate_core's tgt_ok)
    res_in = packed[:, 2:] > 0.5
    res2 = dict(
        res,
        exists=res["exists"].at[tgt].set(res_in, mode="drop"),
        state=res["state"].at[tgt].set(
            jnp.where(res_in, RES_IN, RES_NONE), mode="drop"),
        active=res["active"].at[tgt].set(False, mode="drop"),
        linearized=res["linearized"].at[tgt].set(False, mode="drop"),
        energy=res["energy"].at[tgt].set(0.0, mode="drop"),
    )
    r_energy2 = r_energy.at[tgt].set(0.0, mode="drop")
    res2["energy"] = r_energy2
    return pts2, res2, r_energy2


def make_device_optimizer_fused(settings, F: int, P: int):
    """optimize() + eval-point reset + linearizeAll(true) as ONE program.

    Returns optimize(images, pts, res, jstore, states0, calib0, f_eth0,
    inp, max_iters, newest) -> dict with the final states, the newest
    frame's new evaluation point, packed pulls and the updated stores.

    Memoized per (settings identity, F, P): B window optimizers sharing one
    Settings (the multi-sequence scale-out) share ONE compiled program.
    """
    key = (id(settings), F, P)
    hit = _FUSED_CACHE.get(key)
    if hit is not None and hit[0] is settings:
        return hit[1]
    s = settings
    base = make_device_optimizer(s, F, P)
    ab_zero = jnp.asarray(
        [0.0 if s.affine_opt_mode_a < 0 else 1.0,
         0.0 if s.affine_opt_mode_b < 0 else 1.0], jnp.float32)

    @jax.jit
    def optimize(images, pts, res, jstore, states0, calib0, f_eth0, inp,
                 max_iters, newest, images_quad=None):
        if images_quad is None:
            images_quad = jax.vmap(_interp.build_quad)(images)
        carry = base(images, pts, res, jstore, states0, calib0, f_eth0, inp,
                     max_iters, newest, images_quad)
        states = carry["states"]
        calib = carry["calib"]
        pts2 = carry["pts"]
        res2 = carry["res"]
        jstore2 = carry["jstore"]
        f_eth = carry["f_eth"]

        # --- new linearization point for the newest frame (:550-562) ---
        dR, dt = lie.se3_exp(states[:, :6])
        Rw = jnp.einsum("fij,fjk->fik", dR, inp["evalR"], precision="highest")
        tw = jnp.einsum("fij,fj->fi", dR, inp["evalt"], precision="highest") + dt
        one_hot = (jnp.arange(F) == newest)[:, None, None]
        evalR2 = jnp.where(one_hot, Rw, inp["evalR"])
        evalt2 = jnp.where(one_hot[..., 0], tw, inp["evalt"])
        new_zero_row = jnp.concatenate(
            [jnp.zeros(6, states.dtype), states[newest, 6:8], jnp.zeros(2, states.dtype)]
        )
        state_zero2 = jnp.where(
            (jnp.arange(F) == newest)[:, None], new_zero_row[None, :], inp["state_zero"]
        )
        states2 = jnp.where(
            (jnp.arange(F) == newest)[:, None], new_zero_row[None, :], states
        )

        adH2, adT2, Rl0, tl0 = _adjoints_dev(
            evalR2, evalt2, state_zero2, inp["exposures"], inp["frame_valid"]
        )
        aff0_b2 = state_zero2[:, 7]

        # --- final relinearize + fixLinearization (linearizeAll(true)) ---
        # COLUMN-RESTRICTED: between the loop's last in-body linearize (at
        # the final states AND the final carried calib -- the in-loop
        # linearize threads carry["calib"], so the intrinsics here are the
        # ones the loop already linearized at) and this fix, the only
        # linearization inputs that changed are the NEWEST frame's
        # evaluation point (the new linearization point above) and the
        # newest frame's f_eth (setNewFrameEnergyTH updates only that
        # entry).  Both enter a
        # residual's linearization exclusively through its TARGET frame --
        # no point is ever hosted in the just-inserted keyframe (its
        # immature points don't exist yet during its own makeKeyFrame;
        # asserted host-side in energy._wo_gn_prepare) -- so only the
        # target==newest column needs recomputing.  Everything else is
        # bit-identical to the loop's apply_res output already in
        # res2/jstore2 (same update rule).  Cuts the tail's gather volume
        # and quad build by F (e.g. 8x at a full window).
        KRKi, Kt, aff = _precalc_dev(states2, evalR2, evalt2, calib,
                                     inp["exposures"])

        def colj(a, axis=1):
            return jax.lax.dynamic_slice_in_dim(a, newest, 1, axis=axis)

        img_n = colj(images, axis=0)                      # (1, H, W, 3)
        # the newest column of the already-built table (NOT a rebuild)
        quad_n = colj(images_quad, axis=0)
        out = K.linearize_residuals(
            img_n,
            pts2["u"], pts2["v"], pts2["idepth"], pts2["idepth_zero"],
            pts2["color"], pts2["weights"], pts2["host"], pts2["energy_th"],
            colj(res2["exists"]), colj(res2["state"]),
            PRE_R0=colj(Rl0), PRE_t0=colj(tl0),
            PRE_KRKi=colj(KRKi), PRE_Kt=colj(Kt), PRE_aff=colj(aff),
            PRE_b0=aff0_b2,
            f_energy_th=f_eth,
            calib=calib,
            outlier_th_sum=s.outlier_th_sum_component,
            huber_th=s.huber_th,
            ab_zero=ab_zero,
            target_quad=quad_n,
            f_energy_th_target=jax.lax.dynamic_slice_in_dim(f_eth, newest, 1),
        )

        def merge_col(full, column):
            return jax.lax.dynamic_update_slice_in_dim(full, column, newest,
                                                       axis=1)

        act = res2["exists"] & ~res2["linearized"]
        upd = act & (res2["state"] != RES_OOB)
        act_c, upd_c = colj(act), colj(upd)
        new_state_c = jnp.where(upd_c, out["new_state"], colj(res2["state"]))
        new_state = merge_col(res2["state"], new_state_c)
        new_active = jnp.where(act, new_state == RES_IN, res2["active"])
        energy = merge_col(res2["energy"],
                           jnp.where(upd_c, out["energy"],
                                     colj(res2["energy"])))
        updj = act & (new_state == RES_IN)
        updj_c = act_c & (new_state_c == RES_IN)
        jstore3 = {}
        for k2 in ("Jpdxi", "Jpdc", "Jpdd", "JIdx", "JabF", "resF",
                   "JIdx2", "JabJIdx", "Jab2"):
            extra = (1,) * (out[k2].ndim - 2)
            col_merged = jnp.where(updj_c.reshape(updj_c.shape + extra),
                                   out[k2], colj(jstore2[k2]))
            jstore3[k2] = merge_col(jstore2[k2], col_merged)

        d = (states2 - state_zero2)[:, :8]
        dpair = (
            jnp.einsum("hk,htkj->htj", d, adH2, precision="highest")
            + jnp.einsum("tk,htkj->htj", d, adT2, precision="highest")
        )
        c_delta = calib - inp["calib_zero"]
        p_delta = pts2["idepth"] - pts2["idepth_zero"]
        dp = dpair[pts2["host"]]
        Jp_dx = (
            jnp.einsum("pfk,pfk->pf", jstore3["Jpdxi"][:, :, 0, :], dp[..., :6])
            + jnp.einsum("pfk,k->pf", jstore3["Jpdc"][:, :, 0, :], c_delta)
            + jstore3["Jpdd"][..., 0] * p_delta[:, None]
        )
        Jp_dy = (
            jnp.einsum("pfk,pfk->pf", jstore3["Jpdxi"][:, :, 1, :], dp[..., :6])
            + jnp.einsum("pfk,k->pf", jstore3["Jpdc"][:, :, 1, :], c_delta)
            + jstore3["Jpdd"][..., 1] * p_delta[:, None]
        )
        rtz = (
            jstore3["resF"]
            - jstore3["JIdx"][:, :, 0, :] * Jp_dx[..., None]
            - jstore3["JIdx"][:, :, 1, :] * Jp_dy[..., None]
            - jstore3["JabF"][:, :, 0, :] * dp[..., 6:7]
            - jstore3["JabF"][:, :, 1, :] * dp[..., 7:8]
        )
        jstore3["res_toZero"] = jnp.where(updj[..., None], rtz,
                                          jstore2["res_toZero"])
        # marg-only linearization: see the note in the in-loop fix above
        new_linearized = res2["linearized"]
        bad = act & (new_state != RES_IN)
        exists = res2["exists"] & ~bad
        # recorded pre-drop state for the lastResiduals bookkeeping
        # (reference FullSystemOptimize.cpp:172-181: the state is noted
        # BEFORE toRemove deletes the residual)
        state_rec = new_state
        new_state = jnp.where(bad, RES_NONE, new_state)
        new_active = new_active & ~bad

        act_energy = jnp.sum(jnp.where(act, energy, 0.0))
        nres_in = jnp.sum(act & (new_state == RES_IN))
        # the column call's center_proj IS the newest column
        center_newest = out["center_proj"][:, 0]
        res_bits = (
            exists.astype(jnp.uint8)
            + (new_state.astype(jnp.uint8) << 1)
            + (new_active.astype(jnp.uint8) << 3)
            + (new_linearized.astype(jnp.uint8) << 4)
            + (state_rec.astype(jnp.uint8) << 5)   # pre-drop recorded state
        )
        res3 = dict(res2, exists=exists, state=new_state, active=new_active,
                    linearized=new_linearized, energy=energy)
        # one packed small pull: [act_energy, nres_in, calib(4),
        #                          f_eth(F), states2 flat (F*10)]
        small = jnp.concatenate([
            act_energy[None].astype(jnp.float32),
            nres_in[None].astype(jnp.float32),
            calib.astype(jnp.float32),
            f_eth.astype(jnp.float32),
            states2.reshape(-1).astype(jnp.float32),
        ])
        pts_pack = jnp.stack(
            [pts2["idepth"], pts2["idepth_zero"], pts2["idepth_hessian"]], axis=-1
        )
        # newest eval point (pulled by the host to update FrameState)
        newR = jnp.einsum("f,fij->ij", (jnp.arange(F) == newest).astype(Rw.dtype), Rw)
        newt = jnp.einsum("f,fi->i", (jnp.arange(F) == newest).astype(tw.dtype), tw)
        # EVERYTHING the host needs, as ONE flat pull (each separate
        # device->host transfer costs a ~30 ms tunnel round trip):
        # [small | newR(9) | newt(3) | pts_pack(P*3) | res_bits(P*F/4)]
        # res_bits ride as 4 uint8 per f32 word (bitcast, NOT a convert:
        # pulling one byte per flag grid instead of one f32 cuts ~0.4 MB
        # off the per-KF pull at preset-0 on a ~19 ms/MB link); byte
        # values <=127 keep the exponent <255, so no NaN bit patterns.
        # The host must read these words as raw f32 bits (view, never a
        # float64 conversion) -- see _wo_gn_adopt.
        bits_f32 = jax.lax.bitcast_convert_type(
            res_bits.reshape(P * F // 4, 4), jnp.float32)
        flat = jnp.concatenate([
            small, newR.reshape(-1), newt,
            pts_pack.reshape(-1), bits_f32,
        ])
        return dict(res=res3, jstore=jstore3, pts=pts2, res_bits=res_bits,
                    small=small, pts_pack=pts_pack, flat=flat,
                    center_newest=center_newest, newR=newR, newt=newt)

    @jax.jit
    def optimize_flat(images, jstore, flat_in, flat_u8, pts_static,
                      r_energy, max_iters, newest, images_quad=None):
        pts, res, states0, calib0, f_eth0, inp = _gn_unflatten(
            flat_in, flat_u8, pts_static, r_energy, F, P)
        return optimize(images, pts, res, jstore, states0, calib0, f_eth0,
                        inp, max_iters, newest, images_quad)

    optimize.flat = optimize_flat
    _FUSED_CACHE[key] = (settings, optimize)
    return optimize


_ACT_GN_CACHE: dict = {}


def make_gn_with_activation(settings, F: int, P: int, M: int,
                            P_eff: int | None = None):
    """GN entry point with the device-side activation merge prepended
    (the overlapped keyframe path).  P_eff=None -> full-P program;
    otherwise the active-slot-compacted variant (same contract as
    make_device_optimizer_compact, with the activation merge applied
    AFTER the compaction gather at host-provided compact positions)."""
    key = (id(settings), F, P, M, P_eff)
    hit = _ACT_GN_CACHE.get(key)
    if hit is not None and hit[0] is settings:
        return hit[1]
    if P_eff is None:
        inner = make_device_optimizer_fused(settings, F, P)

        @jax.jit
        def run(images, jstore, flat_in, flat_u8, pts_static, r_energy,
                max_iters, newest, images_quad, act_flat, imm, act_pos):
            pts, res, states0, calib0, f_eth0, inp = _gn_unflatten(
                flat_in, flat_u8, pts_static, r_energy, F, P)
            pts2, res2, r_energy2 = _merge_activation(
                pts, res, r_energy, act_flat, imm, act_pos, F, M, P)
            return inner(images, pts2, res2, jstore, states0, calib0,
                         f_eth0, inp, max_iters, newest, images_quad)
    else:
        inner = make_device_optimizer_fused(settings, F, P_eff)

        @jax.jit
        def run(images, jstore_full, flat_in, flat_u8, idx,
                pts_static_full, r_energy_full, max_iters, newest,
                images_quad, act_flat, imm, act_pos):
            def take(a):
                return jnp.take(a, idx, axis=0, mode="fill", fill_value=0)

            pts_static = {k: take(v) for k, v in pts_static_full.items()}
            jstore = {k: take(v) for k, v in jstore_full.items()}
            r_energy = take(r_energy_full)
            pts, res, states0, calib0, f_eth0, inp = _gn_unflatten(
                flat_in, flat_u8, pts_static, r_energy, F, P_eff)
            pts2, res2, r_energy2 = _merge_activation(
                pts, res, r_energy, act_flat, imm, act_pos, F, M, P_eff)
            out = inner(images, pts2, res2, jstore, states0, calib0,
                        f_eth0, inp, max_iters, newest, images_quad)
            jstore2 = {k: jstore_full[k].at[idx].set(out["jstore"][k],
                                                     mode="drop")
                       for k in jstore_full}
            r_energy2 = r_energy_full.at[idx].set(out["res"]["energy"],
                                                  mode="drop")
            cn = out["center_newest"]
            center = jnp.zeros((P,) + cn.shape[1:], cn.dtype).at[idx].set(
                cn, mode="drop")
            return dict(flat=out["flat"], jstore=jstore2,
                        r_energy=r_energy2, center_newest=center)

    _ACT_GN_CACHE[key] = (settings, run)
    return run


_COMPACT_CACHE: dict = {}


def make_device_optimizer_compact(settings, F: int, P: int, P_eff: int):
    """Active-slot compaction wrapper around the fused GN program.

    Only 20-40% of the P point slots are live in a steady-state window
    (the rest are dead pads or dropped points), yet every per-point op --
    the linearize gather, the 13x13 pair accumulation, the Schur pass --
    pays full P.  The host picks a power-of-two bucket P_eff >= n_live,
    pushes the per-point dynamics ALREADY COMPACTED plus the live-slot
    index list, and this wrapper:

      gather   jstore / static store / r_energy rows at idx (device side,
               ~50 MB of HBM traffic -- microseconds),
      run      the ENTIRE fused GN program at P_eff instead of P,
      scatter  the updated jstore / r_energy / center projections back
               into the full-P canonical stores (idx pads of value P are
               dropped by the scatter mode).

    The compacted pull (out["flat"]) shrinks by the same factor; the host
    scatters it back with the live index (energy._wo_gn_adopt).  Exactness:
    every excluded slot has no existing residuals and is inactive, so in
    the full program it contributes nothing and its only state change is
    idepth_hessian <- 0 (ngood == 0), which the host applies after adopt.
    Parity with the full-P program is pinned by
    tests/test_device_opt.py::test_compact_matches_full."""
    key = (id(settings), F, P, P_eff)
    hit = _COMPACT_CACHE.get(key)
    if hit is not None and hit[0] is settings:
        return hit[1]
    inner = make_device_optimizer_fused(settings, F, P_eff)

    @jax.jit
    def run(images, jstore_full, flat_in, flat_u8, idx, pts_static_full,
            r_energy_full, max_iters, newest, images_quad=None):
        def take(a):
            return jnp.take(a, idx, axis=0, mode="fill", fill_value=0)

        pts_static = {k: take(v) for k, v in pts_static_full.items()}
        jstore = {k: take(v) for k, v in jstore_full.items()}
        r_energy = take(r_energy_full)
        pts, res, states0, calib0, f_eth0, inp = _gn_unflatten(
            flat_in, flat_u8, pts_static, r_energy, F, P_eff)
        out = inner(images, pts, res, jstore, states0, calib0, f_eth0,
                    inp, max_iters, newest, images_quad)
        jstore2 = {k: jstore_full[k].at[idx].set(out["jstore"][k], mode="drop")
                   for k in jstore_full}
        r_energy2 = r_energy_full.at[idx].set(out["res"]["energy"],
                                              mode="drop")
        cn = out["center_newest"]
        center = jnp.zeros((P,) + cn.shape[1:], cn.dtype).at[idx].set(
            cn, mode="drop")
        return dict(flat=out["flat"], jstore=jstore2,
                    r_energy=r_energy2, center_newest=center)

    _COMPACT_CACHE[key] = (settings, run)
    return run
