"""Sliding-window energy functional: accumulation, solve, marginalization.

Host orchestration of the BA rebuild of EnergyFunctional
(reference: src/OptimizationBackend/EnergyFunctional.cpp).  The per-residual
heavy lifting runs in ba_kernels on device; this module owns

* the window state (FrameState list + PointArrays slots + device image stack),
* adjoint transport of relative Jacobians to absolute states
  (setAdjointsF :46-106),
* the (4+8F)^2 stitch in float64 (AccumulatedTopHessian stitchDouble :171-240,
  AccumulatedSCHessian stitchDouble :157-225) -- mirroring the reference's
  float-accumulate / double-stitch precision split,
* the GN solve with fixed lambda, Jacobi scaling and nullspace
  orthogonalization (solveSystemF :776-914, orthogonalize :719-773),
* frame marginalization via Schur complement on HM/bM (:498-610) and point
  marginalization into HM/bM (:615-676),
* the optimize() loop semantics of FullSystemOptimize.cpp:398-575 under the
  default setting_forceAceptStep=true / SOLVER_FIX_LAMBDA configuration.

All states are REAL units; priors are converted from the reference's scaled
units in window.py.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import CPARS, SCALE_A, SCALE_B, SCALE_XI_TRANS, Settings
from ..geometry import SE3
from ..ops import interp as _interp
from . import ba_kernels as K
from .window import (RES_IN, RES_NONE, RES_OOB, RES_OUTLIER, FrameState,
                     PointArrays, _S2_C, _S2_F)

_J_FIELDS = ("Jpdxi", "Jpdc", "Jpdd", "JIdx", "JabF", "resF",
             "JIdx2", "JabJIdx", "Jab2")


def _aff_from_to(exp_f, exp_t, a_f, b_f, a_t, b_t):
    ef = exp_f if exp_f != 0 else 1.0
    et = exp_t if exp_t != 0 else 1.0
    a = np.exp(a_t - a_f) * et / ef
    return np.array([a, b_t - a * b_f])


@jax.jit
def _merge_jstore(store, new, upd):
    out = {}
    for k in _J_FIELDS:
        extra = (1,) * (new[k].ndim - 2)
        out[k] = jnp.where(upd.reshape(upd.shape + extra), new[k], store[k])
    out["res_toZero"] = store["res_toZero"]
    return out


@jax.jit
def _fix_linearization(store, delta_pair, p_host, c_delta, p_delta, mask):
    """res_toZero = resF - J*delta (EnergyFunctionalStructs.cpp:89-115)."""
    dp = delta_pair[p_host]
    Jp_dx = (
        jnp.einsum("pfk,pfk->pf", store["Jpdxi"][:, :, 0, :], dp[..., :6])
        + jnp.einsum("pfk,k->pf", store["Jpdc"][:, :, 0, :], c_delta)
        + store["Jpdd"][..., 0] * p_delta[:, None]
    )
    Jp_dy = (
        jnp.einsum("pfk,pfk->pf", store["Jpdxi"][:, :, 1, :], dp[..., :6])
        + jnp.einsum("pfk,k->pf", store["Jpdc"][:, :, 1, :], c_delta)
        + store["Jpdd"][..., 1] * p_delta[:, None]
    )
    rtz = (
        store["resF"]
        - store["JIdx"][:, :, 0, :] * Jp_dx[..., None]
        - store["JIdx"][:, :, 1, :] * Jp_dy[..., None]
        - store["JabF"][:, :, 0, :] * dp[..., 6:7]
        - store["JabF"][:, :, 1, :] * dp[..., 7:8]
    )
    res_toZero = jnp.where(mask[..., None], rtz, store["res_toZero"])
    return dict(store, res_toZero=res_toZero)


class WindowOptimizer:
    """The EnergyFunctional + optimize() loop, fixed-slot TPU edition."""

    def __init__(self, settings: Settings, calib_value: np.ndarray, img_hw):
        self.s = settings
        self.F = settings.max_window_frames
        self.P = settings.max_points
        self.H_img, self.W_img = img_hw
        self.frames: list[FrameState] = []
        self.pts = PointArrays(self.P, self.F, settings)
        self.calib_value = np.asarray(calib_value, np.float64).copy()
        self.calib_zero = self.calib_value.copy()
        self.calib_backup = self.calib_value.copy()
        self.calib_step = np.zeros(CPARS)
        self.c_prior = np.full(CPARS, settings.initial_calib_hessian) / np.array(
            [_S2_F, _S2_F, _S2_C, _S2_C]
        )
        self._HM = np.zeros((CPARS, CPARS))
        self._bM = np.zeros(CPARS)
        # point-marg results whose D2H pull has been deferred: list of
        # (device flat, fold-in dim at call time); resolved lazily on the
        # next HM/bM read so the keyframe path never blocks on the pull
        self._pending_marg: list = []
        # device-resident static point store (built lazily by the first GN
        # prepare; insert_points queues incremental scatter rows)
        self._pts_static_dev = None
        self._pts_static_pending: list = []
        self.images = jnp.zeros((self.F, self.H_img, self.W_img, 3), jnp.float32)
        # device-resident quad-tap tables of the window images, built ONCE
        # per KF insert (interp.build_quad); every per-KF device program
        # (window GN, activation) consumes these instead of rebuilding its
        # own (~20 ms per F-image build at KITTI-class shapes)
        self.quads = jnp.zeros(
            (self.F, self.H_img * self.W_img, 12), _interp.QUAD_DTYPE)
        self.jstore = self._empty_jstore()
        self.ad_host = np.zeros((self.F, self.F, 8, 8))
        self.ad_target = np.zeros((self.F, self.F, 8, 8))
        self.res_in_a = 1
        self.last_energy = 0.0
        self.last_nullspaces = []
        # marginalized-residual counts per (host_kf_id, target_kf_id) --
        # the persistent half of the reference's connectivityMap
        # (EnergyFunctional.cpp:423,453-458); the active half is recomputed
        # from the residual grid in connectivity()
        self.conn_marg: dict[tuple[int, int], int] = {}

    # ------------------------------------------------------------------
    def _empty_jstore(self):
        P, F = self.P, self.F
        z = lambda *shape: jnp.zeros(shape, jnp.float32)
        return dict(
            Jpdxi=z(P, F, 2, 6), Jpdc=z(P, F, 2, 4), Jpdd=z(P, F, 2),
            JIdx=z(P, F, 2, 8), JabF=z(P, F, 2, 8), resF=z(P, F, 8),
            JIdx2=z(P, F, 2, 2), JabJIdx=z(P, F, 2, 2), Jab2=z(P, F, 2, 2),
            res_toZero=z(P, F, 8),
        )

    @property
    def n_frames(self):
        return len(self.frames)

    # ------------------------------------------------------------------
    # Window maintenance
    # ------------------------------------------------------------------
    def insert_frame(self, fs: FrameState, dI0) -> int:
        idx = len(self.frames)
        assert idx < self.F
        self.frames.append(fs)
        # traced index: ONE compiled scatter serves every slot (a python
        # int would bake the index and compile per window position)
        self.images, self.quads = _set_image_slot(
            self.images, self.quads, jnp.int32(idx), dI0)
        self.insert_frame_hm()
        self.set_adjoints()
        return idx

    def insert_points(self, host_idx: int, u, v, color, weights, idepth,
                      energy_th, my_type=None, has_prior=False) -> np.ndarray:
        n = len(u)
        slots = self.pts.free_slots(n)
        if len(slots) < n:
            n = len(slots)
        sl = slots[:n]
        p = self.pts
        p.active[sl] = True
        p.host[sl] = host_idx
        p.u[sl] = u[:n]
        p.v[sl] = v[:n]
        p.color[sl] = color[:n]
        p.weights[sl] = weights[:n]
        p.idepth[sl] = idepth[:n]
        p.idepth_zero[sl] = idepth[:n]
        p.energy_th[sl] = energy_th[:n]
        p.prior[sl] = self.s.idepth_fix_prior if has_prior else 0.0
        p.has_depth_prior[sl] = has_prior
        p.num_good_res[sl] = 0
        p.max_rel_baseline[sl] = 0
        p.status[sl] = 0
        # lastResiduals default OOB (reference FullSystemOptPoint.cpp:173-176);
        # the caller promotes [0]/[1] to IN when residuals to the newest two
        # frames are added
        p.last_res_state[sl] = RES_OOB
        if my_type is not None:
            p.my_type[sl] = my_type[:n]
        p.r_exists[sl] = False
        p.r_state[sl] = RES_NONE
        p.r_active[sl] = False
        p.r_linearized[sl] = False
        # queue the static rows for the device-resident store (flushed by
        # the next GN prepare as one jitted scatter)
        if getattr(self, "_pts_static_dev", None) is not None:
            self._pts_static_pending.append(np.asarray(sl))
        return sl

    def add_residuals(self, point_slots, target_idx: int):
        p = self.pts
        p.r_exists[point_slots, target_idx] = True
        p.r_state[point_slots, target_idx] = RES_IN
        p.r_active[point_slots, target_idx] = False
        p.r_linearized[point_slots, target_idx] = False
        p.r_is_new[point_slots, target_idx] = True

    # ------------------------------------------------------------------
    # Adjoints / deltas / precalc
    # ------------------------------------------------------------------
    def set_adjoints(self):
        """Reference setAdjointsF (:46-106), REAL units (no SCALE factors)."""
        nf = self.n_frames
        self.ad_host[:] = 0
        self.ad_target[:] = 0
        for h in range(nf):
            for t in range(nf):
                host, target = self.frames[h], self.frames[t]
                h2t = target.worldToCam_evalPT * host.worldToCam_evalPT.inverse()
                AH = np.eye(8)
                AT = np.eye(8)
                AH[:6, :6] = -h2t.adj().T
                aff = _aff_from_to(
                    host.ab_exposure, target.ab_exposure,
                    *host.aff_g2l_0(), *target.aff_g2l_0()
                )
                AT[6, 6] = -aff[0]
                AH[6, 6] = aff[0]
                AT[7, 7] = -1.0
                AH[7, 7] = aff[0]
                self.ad_host[h, t] = AH
                self.ad_target[h, t] = AT

    def frame_deltas(self):
        nf = self.n_frames
        d = np.zeros((self.F, 8))
        for i, f in enumerate(self.frames):
            d[i] = f.delta()
        return d

    def delta_pair(self):
        """adHTdeltaF (setDeltaF :171-181): (F,F,8) = dh@AH + dt@AT."""
        d = self.frame_deltas()
        out = np.zeros((self.F, self.F, 8))
        nf = self.n_frames
        for h in range(nf):
            for t in range(nf):
                out[h, t] = d[h] @ self.ad_host[h, t] + d[t] @ self.ad_target[h, t]
        return out

    def c_delta(self):
        return self.calib_value - self.calib_zero

    def precalc(self):
        """Per-pair PRE_* arrays (FrameFramePrecalc::set, HessianBlocks.cpp:192-222)."""
        nf = self.n_frames
        Fd = self.F
        R0 = np.zeros((Fd, Fd, 3, 3), np.float32)
        t0 = np.zeros((Fd, Fd, 3), np.float32)
        KRKi = np.zeros((Fd, Fd, 3, 3), np.float32)
        Kt = np.zeros((Fd, Fd, 3), np.float32)
        aff = np.zeros((Fd, Fd, 2), np.float32)
        b0 = np.zeros(Fd, np.float32)
        fx, fy, cx, cy = self.calib_value
        Km = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        Ki = np.linalg.inv(Km)
        for h in range(nf):
            host = self.frames[h]
            b0[h] = host.aff_g2l_0()[1]
            for t in range(nf):
                target = self.frames[t]
                l2l0 = target.worldToCam_evalPT * host.worldToCam_evalPT.inverse()
                R0[h, t] = l2l0.R
                t0[h, t] = l2l0.t
                l2l = target.PRE_worldToCam * host.PRE_camToWorld
                KRKi[h, t] = Km @ l2l.R @ Ki
                Kt[h, t] = Km @ l2l.t
                aff[h, t] = _aff_from_to(
                    host.ab_exposure, target.ab_exposure,
                    *host.aff_g2l(), *target.aff_g2l()
                )
        return dict(
            PRE_R0=jnp.asarray(R0), PRE_t0=jnp.asarray(t0),
            PRE_KRKi=jnp.asarray(KRKi), PRE_Kt=jnp.asarray(Kt),
            PRE_aff=jnp.asarray(aff), PRE_b0=jnp.asarray(b0),
        )

    # ------------------------------------------------------------------
    # Linearization
    # ------------------------------------------------------------------
    def linearize_all(self, fix: bool):
        """linearizeAll (FullSystemOptimize.cpp:144-211) + applyRes + the
        frame energy threshold update."""
        s = self.s
        p = self.pts
        pre = self.precalc()
        f_eth = np.zeros(self.F, np.float32)
        for i, f in enumerate(self.frames):
            f_eth[i] = f.frame_energy_th
        ab_zero = np.array(
            [0.0 if s.affine_opt_mode_a < 0 else 1.0,
             0.0 if s.affine_opt_mode_b < 0 else 1.0], np.float32)

        out = K.linearize_residuals(
            self.images,
            jnp.asarray(p.u), jnp.asarray(p.v),
            jnp.asarray(p.idepth), jnp.asarray(p.idepth_zero),
            jnp.asarray(p.color), jnp.asarray(p.weights),
            jnp.asarray(p.host), jnp.asarray(p.energy_th),
            jnp.asarray(p.r_exists), jnp.asarray(p.r_state.astype(np.int32)),
            **pre,
            f_energy_th=jnp.asarray(f_eth),
            calib=jnp.asarray(self.calib_value, jnp.float32),
            outlier_th_sum=s.outlier_th_sum_component,
            huber_th=s.huber_th,
            ab_zero=jnp.asarray(ab_zero),
        )

        active_set = p.r_exists & ~p.r_linearized  # "activeResiduals"
        new_state = np.asarray(out["new_state"])
        energy = np.asarray(out["energy"])
        energy_raw = np.asarray(out["energy_raw"])

        # frame energy threshold from the newest frame's residuals
        # (setNewFrameEnergyTH, FullSystemOptimize.cpp:95-143)
        if self.n_frames > 0:
            newest = self.n_frames - 1
            m = active_set[:, newest] & (p.r_state[:, newest] != RES_OOB)
            vals = energy_raw[:, newest][m]
            nf_frame = self.frames[newest]
            if len(vals) == 0:
                nf_frame.frame_energy_th = 12 * 12 * 8.0
            else:
                nth = np.partition(vals, int(s.frame_energy_th_n * len(vals)))[
                    int(s.frame_energy_th_n * len(vals))
                ]
                th = np.sqrt(nth) * s.frame_energy_th_fac_median
                th = 26.0 * s.frame_energy_th_const_weight + th * (1 - s.frame_energy_th_const_weight)
                nf_frame.frame_energy_th = float(th * th) * s.overall_energy_th_weight**2

        # apply: state machine (applyRes, Residuals.cpp:306-328)
        upd = active_set & (p.r_state != RES_OOB)
        p.r_state = np.where(upd, new_state, p.r_state).astype(np.int8)
        p.r_active = np.where(active_set, p.r_state == RES_IN, p.r_active)
        p.r_energy = np.where(upd, energy, p.r_energy)

        # merge fresh Jacobians for residuals that are IN (takeDataF)
        upd_j = jnp.asarray(active_set & (p.r_state == RES_IN))
        self.jstore = _merge_jstore(self.jstore, out, upd_j)

        # numGoodResiduals for new residuals -- only at fixLinearization
        # (reference FullSystemOptimize.cpp:58-80: the isNew bookkeeping
        # runs inside the fixLinearization branch of the reductor)
        if fix:
            isnew = p.r_is_new & upd & (p.r_state == RES_IN)
            if isnew.any():
                p.num_good_res += isnew.sum(1).astype(np.int32)
        self._last_center_proj = np.asarray(out["center_proj"])
        if self.n_frames > 0:
            self._center_newest_dev = out["center_proj"][:, self.n_frames - 1]

        self.last_energy = float(energy[active_set].sum())

        removed = None
        if fix:
            # lastResiduals state recording (FullSystemOptimize.cpp:172-181):
            # [0] <-> the residual to the newest frame, [1] <-> the second
            # newest; only active (non-linearized) residuals update, and the
            # recorded state survives the drop below
            nf = self.n_frames
            for k1, col in ((0, nf - 1), (1, nf - 2)):
                if col >= 0:
                    mrec = active_set[:, col]
                    p.last_res_state[mrec, k1] = p.r_state[mrec, col]
            # fixLinearizationF for active residuals (store res_toZero)
            mask = jnp.asarray(active_set & (p.r_state == RES_IN))
            self.jstore = _fix_linearization(
                self.jstore, jnp.asarray(self.delta_pair(), jnp.float32),
                jnp.asarray(p.host), jnp.asarray(self.c_delta(), jnp.float32),
                jnp.asarray(p.idepth - p.idepth_zero), mask,
            )
            # NOTE: residuals are NOT flagged linearized here.  In the
            # reference, fixLinearizationF runs ONLY on residuals of points
            # being marginalized (FullSystem.cpp:978-989); every window
            # residual is re-linearized fresh each keyframe ("0 lin res" in
            # its OPTIMIZE log lines).  Latching r_linearized at fix time
            # froze the whole window into stale linear approximations --
            # the round-3 accuracy root cause.  res_toZero (stored above)
            # is still captured for the point-marg fold.
            # drop residuals that did not make it (toRemove, :172-206)
            bad = active_set & (p.r_state != RES_IN)
            removed = bad
            p.r_exists[bad] = False
            p.r_active[bad] = False
            p.r_state[bad] = RES_NONE
            p.r_is_new[active_set] = False
        return self.last_energy, removed

    # ------------------------------------------------------------------
    # Accumulation + solve
    # ------------------------------------------------------------------
    def _accumulate(self, mode: int, subset=None):
        """mode 0 = active, 1 = linearized (FEJ-shifted), 2 = marginalize."""
        p = self.pts
        if mode == 0:
            mask = p.r_exists & ~p.r_linearized & p.r_active
            res_approx = self.jstore["resF"]
        elif mode == 1:
            mask = p.r_exists & p.r_linearized & p.r_active
            res_approx = K.res_approx_mode1(
                self.jstore, jnp.asarray(self.delta_pair(), jnp.float32),
                jnp.asarray(p.host), jnp.asarray(self.c_delta(), jnp.float32),
                jnp.asarray(p.idepth - p.idepth_zero),
            )
        else:
            mask = p.r_exists & p.r_active
            res_approx = self.jstore["res_toZero"]
        if subset is not None:
            mask = mask & subset[:, None]
        acc, nres, Hdd, bd, Hcd = K.accumulate_top(
            self.jstore, res_approx, jnp.asarray(mask), jnp.asarray(p.host), self.F
        )
        return (np.asarray(acc, np.float64), int(nres),
                np.asarray(Hdd, np.float64), np.asarray(bd, np.float64),
                np.asarray(Hcd, np.float64), mask)

    def _stitch_top(self, acc, use_prior: bool):
        """stitchDouble (AccumulatedTopHessian.cpp:171-240)."""
        nf = self.n_frames
        n = CPARS + nf * 8
        H = np.zeros((n, n))
        b = np.zeros(n)
        for h in range(nf):
            for t in range(nf):
                a = acc[h * self.F + t]
                hI, tI = CPARS + h * 8, CPARS + t * 8
                accH8 = a[4:12, 4:12]
                accH8C = a[4:12, 0:4]
                AH, AT = self.ad_host[h, t], self.ad_target[h, t]
                H[hI : hI + 8, hI : hI + 8] += AH @ accH8 @ AH.T
                H[tI : tI + 8, tI : tI + 8] += AT @ accH8 @ AT.T
                H[hI : hI + 8, tI : tI + 8] += AH @ accH8 @ AT.T
                H[hI : hI + 8, 0:CPARS] += AH @ accH8C
                H[tI : tI + 8, 0:CPARS] += AT @ accH8C
                H[0:CPARS, 0:CPARS] += a[0:4, 0:4]
                b[hI : hI + 8] += AH @ a[4:12, 12]
                b[tI : tI + 8] += AT @ a[4:12, 12]
                b[0:CPARS] += a[0:4, 12]
        # symmetrize/copy transposed parts
        for h in range(nf):
            hI = CPARS + h * 8
            H[0:CPARS, hI : hI + 8] = H[hI : hI + 8, 0:CPARS].T
            for t in range(h + 1, nf):
                tI = CPARS + t * 8
                H[hI : hI + 8, tI : tI + 8] += H[tI : tI + 8, hI : hI + 8].T
                H[tI : tI + 8, hI : hI + 8] = H[hI : hI + 8, tI : tI + 8].T
        if use_prior:
            H[np.arange(CPARS), np.arange(CPARS)] += self.c_prior
            b[0:CPARS] += self.c_prior * self.c_delta()
            for h in range(nf):
                hI = CPARS + h * 8
                pr = self.frames[h].prior()
                H[np.arange(hI, hI + 8), np.arange(hI, hI + 8)] += pr
                b[hI : hI + 8] += pr * self.frames[h].delta_prior()
        return H, b

    def _schur(self, maskA, maskL, HddA, bdA, HcdA, HddL, bdL, HcdL,
               shift_prior_to_zero: bool, subset=None):
        """Per-point Schur quantities + device pair accumulation + f64 stitch
        (AccumulatedSCHessian.cpp)."""
        p = self.pts
        mask = np.asarray(maskA) | np.asarray(maskL)
        if subset is not None:
            mask = mask & subset[:, None]
        ngood = mask.sum(1)
        Hdd = HddA + HddL + p.prior.astype(np.float64)
        Hdd = np.maximum(Hdd, 1e-10)
        HdiF = np.where(ngood > 0, 1.0 / Hdd, 0.0)
        p.idepth_hessian = np.where(ngood > 0, Hdd, 0.0).astype(np.float32)
        bdSum = bdA + bdL
        if shift_prior_to_zero:
            bdSum = bdSum + p.prior * (p.idepth - p.idepth_zero)
        bdSum = np.where(ngood > 0, bdSum, 0.0)
        Hcd = HcdA + HcdL

        JpJdF = K.compute_JpJdF(self.jstore, self.F)
        accD, accE, accEB, accHcc, accbc = K.accumulate_sc(
            JpJdF, jnp.asarray(Hcd, jnp.float32), jnp.asarray(bdSum, jnp.float32),
            jnp.asarray(HdiF, jnp.float32), jnp.asarray(mask),
            jnp.asarray(p.host), self.F,
        )
        accD = np.asarray(accD, np.float64)
        accE = np.asarray(accE, np.float64)
        accEB = np.asarray(accEB, np.float64)

        nf = self.n_frames
        n = CPARS + nf * 8
        H = np.zeros((n, n))
        b = np.zeros(n)
        for i in range(nf):
            for j in range(nf):
                iI, jI = CPARS + i * 8, CPARS + j * 8
                AHij, ATij = self.ad_host[i, j], self.ad_target[i, j]
                Hpc = accE[i, j]
                bp = accEB[i, j]
                H[iI : iI + 8, 0:CPARS] += AHij @ Hpc
                H[jI : jI + 8, 0:CPARS] += ATij @ Hpc
                b[iI : iI + 8] += AHij @ bp
                b[jI : jI + 8] += ATij @ bp
                for k in range(nf):
                    kI = CPARS + k * 8
                    accDM = accD[i, j, k]
                    AHik, ATik = self.ad_host[i, k], self.ad_target[i, k]
                    H[iI : iI + 8, iI : iI + 8] += AHij @ accDM @ AHik.T
                    H[jI : jI + 8, kI : kI + 8] += ATij @ accDM @ ATik.T
                    H[jI : jI + 8, iI : iI + 8] += ATij @ accDM @ AHik.T
                    H[iI : iI + 8, kI : kI + 8] += AHij @ accDM @ ATik.T
        H[0:CPARS, 0:CPARS] += np.asarray(accHcc, np.float64)
        b[0:CPARS] += np.asarray(accbc, np.float64)
        for h in range(nf):
            hI = CPARS + h * 8
            H[0:CPARS, hI : hI + 8] = H[hI : hI + 8, 0:CPARS].T
        return H, b, HdiF, bdSum, Hcd, ngood, mask

    def stitched_delta(self):
        nf = self.n_frames
        d = np.zeros(CPARS + nf * 8)
        d[:CPARS] = self.c_delta()
        fd = self.frame_deltas()
        for i in range(nf):
            d[CPARS + 8 * i : CPARS + 8 * i + 8] = fd[i]
        return d

    def nullspaces(self):
        """getNullspaces (FullSystemOptimize.cpp:658-712), real units."""
        nf = self.n_frames
        n = CPARS + nf * 8
        ns = []
        for i in range(6):
            v = np.zeros(n)
            for k, f in enumerate(self.frames):
                v[CPARS + k * 8 : CPARS + k * 8 + 6] = f.nullspaces_pose[:, i]
            ns.append(v)
        v = np.zeros(n)
        for k, f in enumerate(self.frames):
            v[CPARS + k * 8 : CPARS + k * 8 + 6] = f.nullspaces_scale
        ns.append(v)
        self.last_nullspaces = ns
        return ns

    def orthogonalize(self, x=None, H=None):
        """Project out pose+scale gauge directions (:719-773)."""
        ns = self.last_nullspaces or self.nullspaces()
        N = np.stack([v / (np.linalg.norm(v) + 1e-30) for v in ns], axis=1)
        U, S, Vt = np.linalg.svd(N, full_matrices=False)
        Sinv = np.where(S > self.s.solver_mode_delta * S.max(), 1.0 / S, 0.0)
        Npi = U * Sinv[None, :] @ Vt
        NNpiT = N @ Npi.T
        NNpiTS = 0.5 * (NNpiT + NNpiT.T)
        if x is not None:
            x = x - NNpiTS @ x
        if H is not None:
            H = H - NNpiTS @ H @ NNpiTS
        return x, H

    def solve_system(self, iteration: int, lam: float):
        """solveSystemF default path (:776-914)."""
        s = self.s
        self.nullspaces()
        accA, nresA, HddA, bdA, HcdA, maskA = self._accumulate(0)
        accL, nresL, HddL, bdL, HcdL, maskL = self._accumulate(1)
        self.res_in_a = max(nresA, 1)
        HA, bA = self._stitch_top(accA, use_prior=False)
        HL, bL = self._stitch_top(accL, use_prior=True)
        Hsc, bsc, HdiF, bdSum, HcdSum, ngood, scmask = self._schur(
            maskA, maskL, HddA, bdA, HcdA, HddL, bdL, HcdL, True
        )

        nf = self.n_frames
        n = CPARS + nf * 8
        delta = self.stitched_delta()
        bM_top = self.bM[:n] + self.HM[:n, :n] @ delta

        HFinal = HL + self.HM[:n, :n] + HA
        bFinal = bL + bM_top + bA - bsc
        HFinal[np.arange(n), np.arange(n)] *= 1 + lam
        HFinal = HFinal - Hsc * (1.0 / (1 + lam))

        SVecI = 1.0 / np.sqrt(np.abs(np.diag(HFinal)) + 10.0)
        Hs = HFinal * SVecI[:, None] * SVecI[None, :]
        x = SVecI * np.linalg.solve(Hs, SVecI * bFinal)

        if iteration >= 2:  # SOLVER_ORTHOGONALIZE_X_LATER (default mode)
            x, _ = self.orthogonalize(x=x)

        # resubstitute (EnergyFunctional.cpp:263-317)
        self.calib_step = -x[:CPARS]
        for i, f in enumerate(self.frames):
            f.step[:] = 0
            f.step[:8] = -x[CPARS + 8 * i : CPARS + 8 * i + 8]
        xAd = np.zeros((self.F, self.F, 8))
        for h in range(nf):
            xh = x[CPARS + 8 * h : CPARS + 8 * h + 8]
            for t in range(nf):
                xt = x[CPARS + 8 * t : CPARS + 8 * t + 8]
                xAd[h, t] = xh @ self.ad_host[h, t] + xt @ self.ad_target[h, t]
        JpJdF = K.compute_JpJdF(self.jstore, self.F)
        steps = K.resubstitute(
            jnp.asarray(x[:CPARS], jnp.float32), jnp.asarray(xAd, jnp.float32),
            JpJdF, jnp.asarray(scmask), jnp.asarray(self.pts.host),
            jnp.asarray(HcdSum, jnp.float32), jnp.asarray(bdSum, jnp.float32),
            jnp.asarray(HdiF, jnp.float32), jnp.asarray(ngood), self.F,
        )
        self.pts.step = np.asarray(steps)
        return x

    # ------------------------------------------------------------------
    # The optimize() loop (FullSystemOptimize.cpp:398-575, default modes)
    # ------------------------------------------------------------------
    def backup_state(self):
        self.calib_backup = self.calib_value.copy()
        for f in self.frames:
            f.state_backup = f.state.copy()
        self.pts.idepth_backup = self.pts.idepth.copy()

    def do_step_from_backup(self) -> bool:
        """Apply steps; returns True when converged (:217-299)."""
        s = self.s
        self.calib_value = self.calib_backup + self.calib_step
        sumA = sumB = sumT = sumR = 0.0
        for f in self.frames:
            f.set_state(f.state_backup + f.step)
            sumA += f.step[6] ** 2
            sumB += f.step[7] ** 2
            sumT += float(np.sum(f.step[0:3] ** 2))
            sumR += float(np.sum(f.step[3:6] ** 2))
        p = self.pts
        act = p.active
        newid = p.idepth_backup + p.step
        p.idepth = np.where(act, newid, p.idepth).astype(np.float32)
        p.idepth_zero = np.where(act, newid, p.idepth_zero).astype(np.float32)
        nid = max(int(act.sum()), 1)
        sumID = float(np.sum((p.step[act]) ** 2)) / nid
        sumNID = float(np.sum(np.abs(p.idepth_backup[act]))) / nid
        nf = max(self.n_frames, 1)
        # convergence in the reference's scaled units
        sumA /= nf * SCALE_A**2
        sumB /= nf * SCALE_B**2
        sumT /= nf * SCALE_XI_TRANS**2
        sumR /= nf
        th = s.th_opt_iterations
        return (
            np.sqrt(sumA) < 0.0005 * th
            and np.sqrt(sumB) < 0.00005 * th
            and np.sqrt(sumR) < 0.00005 * th
            and np.sqrt(sumT) * sumNID < 0.00005 * th
        )

    def optimize(self, max_iters: int) -> float:
        """GN iterations under forceAcceptStep + FIX_LAMBDA defaults."""
        if self.n_frames < 2:
            return 0.0
        if self.n_frames < 3:
            max_iters = 20
        elif self.n_frames < 4:
            max_iters = 15

        p = self.pts
        # reset OOB state of active (non-linearized) residuals (resetOOB)
        act = p.r_exists & ~p.r_linearized
        p.r_state = np.where(act, RES_IN, p.r_state).astype(np.int8)

        self.linearize_all(False)
        lam = 1e-5  # SOLVER_FIX_LAMBDA
        for it in range(max_iters):
            self.backup_state()
            self.solve_system(it, lam)
            canbreak = self.do_step_from_backup()
            self.linearize_all(False)
            if canbreak and it >= self.s.min_opt_iterations:
                break

        # new linearization point for the newest frame (:550-562)
        newest = self.frames[-1]
        new_zero = np.zeros(10)
        new_zero[6:8] = newest.state[6:8]
        newest.set_eval_pt(newest.PRE_worldToCam, new_zero)
        self.set_adjoints()

        energy, _removed = self.linearize_all(True)
        rmse = float(np.sqrt(energy / (8.0 * self.res_in_a)))

        # push optimized poses to shells
        for f in self.frames:
            if f.shell is not None:
                f.shell.camToWorld = f.PRE_camToWorld
                f.shell.aff_g2l = f.aff_g2l()
        return rmse

    # ------------------------------------------------------------------
    # Marginalization
    # ------------------------------------------------------------------
    def connectivity(self) -> dict:
        """(host_kf_id, target_kf_id) -> [n_active_res, n_marg_res]
        (reference connectivityMap, published via publishGraph)."""
        p = self.pts
        nf = self.n_frames
        counts = np.zeros((self.F, self.F), np.int64)
        sel = p.active
        np.add.at(counts, p.host[sel], p.r_exists[sel].astype(np.int64))
        out = {}
        for h in range(nf):
            hid = self.frames[h].frame_id
            for t in range(nf):
                if counts[h, t]:
                    out[(hid, self.frames[t].frame_id)] = [int(counts[h, t]), 0]
        for key, nm in self.conn_marg.items():
            ent = out.setdefault(key, [0, 0])
            ent[1] += nm
        return out

    def marginalize_points(self, marg_mask: np.ndarray):
        """marginalizePointsF (:615-676): fold flagged points into HM/bM."""
        p = self.pts
        s = self.s
        sel = marg_mask & p.active
        if not sel.any():
            self.pts.remove(np.nonzero(marg_mask)[0])
            return
        # connectivity bookkeeping: these residuals become marginalized
        nf = self.n_frames
        cm = np.zeros((nf, nf), np.int64)
        np.add.at(cm, p.host[sel], p.r_exists[sel][:, :nf].astype(np.int64))
        for h, t in zip(*np.nonzero(cm)):
            key = (self.frames[int(h)].frame_id, self.frames[int(t)].frame_id)
            self.conn_marg[key] = self.conn_marg.get(key, 0) + int(cm[h, t])
        p.prior = np.where(sel, p.prior * s.idepth_fix_prior_marg_fac, p.prior)
        # ONE device call + ONE flat pull: accumulation + Schur + stitch all
        # run on device (device_opt.make_marg_points); the long-lived HM/bM
        # stay f64 on the host
        mask = p.r_exists & p.r_active & sel[:, None]
        fn = D.make_marg_points(s, self.F, self.P)
        flat_dev = fn(
            self.jstore, jnp.asarray(mask), jnp.asarray(p.host),
            jnp.asarray(p.prior, jnp.float32),
            jnp.asarray(self.ad_host, jnp.float32),
            jnp.asarray(self.ad_target, jnp.float32),
        )
        # defer the D2H pull: the fold into HM/bM is additive and nothing
        # reads HM/bM until the next keyframe's GN (or a frame marg, which
        # resolves first through the HM property) -- so the mapping thread
        # does not block here.  Start the transfer NOW so it overlaps the
        # host work between here and the next HM read (the resolve used to
        # pay the full device-queue wait + pull inside marg_frames).
        try:
            flat_dev.copy_to_host_async()
        except AttributeError:
            pass
        self._pending_marg.append((flat_dev, CPARS + self.n_frames * 8))
        self.pts.remove(np.nonzero(sel)[0])

    # -- HM/bM: lazily fold deferred point-marg pulls on first read -------
    @property
    def HM(self):
        self._resolve_pending_marg()
        return self._HM

    @HM.setter
    def HM(self, v):
        self._HM = v

    @property
    def bM(self):
        self._resolve_pending_marg()
        return self._bM

    @bM.setter
    def bM(self, v):
        self._bM = v

    def _resolve_pending_marg(self):
        if not self._pending_marg:
            return
        pend, self._pending_marg = self._pending_marg, []
        s = self.s
        n_full = CPARS + 8 * self.F
        for flat_dev, n in pend:
            flat = np.asarray(flat_dev, np.float64)
            Hfull = flat[: n_full * n_full].reshape(n_full, n_full)
            Hfull = 0.5 * (Hfull + Hfull.T)  # strip f32 stitch asymmetry
            bfull = flat[n_full * n_full :]
            self._HM, self._bM = self._grow_hm_raw(n)
            self._HM[:n, :n] += s.marg_weight_fac * Hfull[:n, :n]
            self._bM[:n] += s.marg_weight_fac * bfull[:n]

    def _grow_hm_raw(self, n):
        HM = np.zeros((n, n))
        bM = np.zeros(n)
        m = min(n, self._HM.shape[0])
        HM[:m, :m] = self._HM[:m, :m]
        bM[:m] = self._bM[:m]
        return HM, bM

    def _grow_hm(self, n):
        self._resolve_pending_marg()
        return self._grow_hm_raw(n)

    def insert_frame_hm(self):
        """Extend HM/bM by 8 zero rows/cols for a newly inserted frame."""
        n = CPARS + self.n_frames * 8
        self.HM, self.bM = self._grow_hm(n)

    def marginalize_frame(self, idx: int):
        """Schur-marginalize frame idx out of HM/bM (:500-610) and compact
        the window."""
        nf = self.n_frames
        n = CPARS + nf * 8
        ndim = n - 8
        HM, bM = self._grow_hm(n)

        # move frame block to the end
        order = list(range(nf))
        order.remove(idx)
        order.append(idx)
        perm = np.arange(CPARS).tolist()
        for k in order:
            perm += list(range(CPARS + 8 * k, CPARS + 8 * k + 8))
        perm = np.array(perm)
        HM = HM[np.ix_(perm, perm)]
        bM = bM[perm]

        fr = self.frames[idx]
        pr = fr.prior()
        HM[np.arange(ndim, n), np.arange(ndim, n)] += pr
        bM[ndim:] += pr * fr.delta_prior()

        SVec = np.sqrt(np.abs(np.diag(HM)) + 10.0)
        SVecI = 1.0 / SVec
        HMs = HM * SVecI[:, None] * SVecI[None, :]
        bMs = bM * SVecI
        hpi = HMs[ndim:, ndim:]
        hpi = np.linalg.pinv(0.5 * (hpi + hpi.T))
        hpi = 0.5 * (hpi + hpi.T)
        bli = HMs[ndim:, :ndim].T @ hpi
        HMs_new = HMs[:ndim, :ndim] - bli @ HMs[ndim:, :ndim]
        bMs_new = bMs[:ndim] - bli @ bMs[ndim:]
        HM_new = HMs_new * SVec[:ndim, None] * SVec[None, :ndim]
        bM_new = bMs_new * SVec[:ndim]
        self.HM = 0.5 * (HM_new + HM_new.T)
        self.bM = bM_new

        # compact window
        self.frames.pop(idx)
        # shift image slots + jstore columns down on device as ONE
        # dispatch (each separate device op costs ms on the tunnel)
        perm = jnp.asarray(
            list(range(idx)) + list(range(idx + 1, self.F)) + [idx]
        )
        self.jstore, self.images, self.quads = _permute_stores(
            self.jstore, self.images, self.quads, perm)
        self.pts.shift_frame_down(idx, nf - 1)
        if getattr(self, "_r_energy_dev", None) is not None:
            self._r_energy_dev = _permute_cols(self._r_energy_dev, perm)
        self.set_adjoints()


@jax.jit
def _set_image_slot(images, quads, idx, dI0):
    """Write one image slot AND its quad-tap table in one dispatch (the
    quad is built once here, then reused by every per-KF program)."""
    q = _interp.build_quad(dI0)
    return (jax.lax.dynamic_update_index_in_dim(images, dI0, idx, 0),
            jax.lax.dynamic_update_index_in_dim(quads, q, idx, 0))


@jax.jit
def _permute_stores(jstore, images, quads, perm):
    """Frame-column permute of the FEJ store + image/quad-slot permute,
    fused into one device program (marginalizeFrame compaction)."""
    return ({k: v[:, perm] for k, v in jstore.items()}, images[perm],
            quads[perm])


@jax.jit
def _permute_cols(a, perm):
    return a[:, perm]


# ---------------------------------------------------------------------------
# Device-resident optimize loop (one call per keyframe) -- see device_opt.py
# ---------------------------------------------------------------------------

from . import device_opt as D  # noqa: E402


def _wo_host_inputs(self):
    """The per-KF host-computed constants of the device loop, as numpy."""
    F = self.F
    nf = self.n_frames
    evalR = np.zeros((F, 3, 3), np.float32)
    evalt = np.zeros((F, 3), np.float32)
    state_zero = np.zeros((F, 10), np.float32)
    exposures = np.ones(F, np.float32)
    aff0_b = np.zeros(F, np.float32)
    frame_prior = np.zeros((F, 8), np.float32)
    frame_valid = np.zeros(F, bool)
    PRE_R0 = np.zeros((F, F, 3, 3), np.float32)
    PRE_t0 = np.zeros((F, F, 3), np.float32)
    for i, f in enumerate(self.frames):
        evalR[i] = f.worldToCam_evalPT.R
        evalt[i] = f.worldToCam_evalPT.t
        state_zero[i] = f.state_zero
        exposures[i] = f.ab_exposure
        aff0_b[i] = f.aff_g2l_0()[1]
        frame_prior[i] = f.prior()
        frame_valid[i] = True
        for j, g in enumerate(self.frames):
            l2l0 = g.worldToCam_evalPT * f.worldToCam_evalPT.inverse()
            PRE_R0[i, j] = l2l0.R
            PRE_t0[i, j] = l2l0.t
    n = CPARS + 8 * F
    HMp = np.zeros((n, n), np.float32)
    bMp = np.zeros(n, np.float32)
    na = CPARS + 8 * nf
    HMp[:na, :na] = self.HM[:na, :na]
    bMp[:na] = self.bM[:na]
    # nullspace projector (constant during the loop)
    NNpiTS = np.zeros((n, n), np.float32)
    ns = self.nullspaces() if nf else []
    if ns:
        N = np.stack([v / (np.linalg.norm(v) + 1e-30) for v in ns], axis=1)
        U, S_, Vt = np.linalg.svd(N, full_matrices=False)
        with np.errstate(divide="ignore"):
            Sinv = np.where(S_ > self.s.solver_mode_delta * S_.max(), 1.0 / S_, 0.0)
        Npi = U * Sinv[None, :] @ Vt
        NNpiT = N @ Npi.T
        NNpiTS[:na, :na] = 0.5 * (NNpiT + NNpiT.T)
    return dict(
        evalR=evalR, evalt=evalt, state_zero=state_zero,
        exposures=exposures, aff0_b=aff0_b,
        frame_prior=frame_prior, frame_valid=frame_valid,
        PRE_R0=PRE_R0, PRE_t0=PRE_t0,
        adH=np.asarray(self.ad_host, np.float32),
        adT=np.asarray(self.ad_target, np.float32),
        HM=HMp, bM=bMp, NNpiTS=NNpiTS,
        calib_value=np.asarray(self.calib_value, np.float32),
        calib_zero=np.asarray(self.calib_zero, np.float32),
        c_prior=np.asarray(self.c_prior, np.float32),
    )


def _wo_device_inputs(self):
    """Pack the per-KF constants for the device loop (jnp pytree)."""
    return {k: jnp.asarray(v) for k, v in _wo_host_inputs(self).items()}


def _wo_gn_flat(self, states0, f_eth0, live_rows=None, P_eff=None):
    """Build the dynamic f32 push + packed-u8 push for the fused GN
    program (device_opt.gn_flat_layout / gn_u8_layout).  The static
    per-point data travels separately via the device-resident store
    (_wo_pts_static).

    With live_rows/P_eff the per-point fields travel COMPACTED: only the
    live slots' rows, padded to the P_eff bucket (the device program
    gathers the device-resident stores with the same index list)."""
    p = self.pts
    hi = _wo_host_inputs(self)
    if live_rows is None:
        per_pt = [p.idepth, p.idepth_zero, p.prior, p.idepth_hessian]
        u8 = D.pack_res_u8(p, self.F, self.P)
    else:
        n_live = len(live_rows)

        def cpt(a):
            out = np.zeros((P_eff,) + a.shape[1:], a.dtype)
            out[:n_live] = a[live_rows]
            return out

        per_pt = [cpt(p.idepth), cpt(p.idepth_zero), cpt(p.prior),
                  cpt(p.idepth_hessian)]
        bits = (
            p.r_exists.astype(np.uint8)
            + (p.r_state.astype(np.uint8) << 1)
            + (p.r_active.astype(np.uint8) << 3)
            + (p.r_linearized.astype(np.uint8) << 4)
        )
        u8 = np.concatenate([
            cpt(bits).reshape(-1),
            cpt(p.active.astype(np.uint8)),
            cpt(p.host.astype(np.uint8)),
        ])
    parts = per_pt + [
        states0, np.asarray(self.calib_value, np.float32), f_eth0,
        hi["evalR"], hi["evalt"], hi["state_zero"], hi["exposures"],
        hi["aff0_b"], hi["frame_prior"], hi["frame_valid"],
        hi["PRE_R0"], hi["PRE_t0"], hi["adH"], hi["adT"],
        hi["HM"], hi["bM"], hi["NNpiTS"],
        hi["calib_value"], hi["calib_zero"], hi["c_prior"],
    ]
    flat = np.concatenate([np.asarray(a, np.float32).ravel() for a in parts])
    return flat, u8


_PTS_SCATTER_CHUNK = 2048


def _wo_pts_static(self):
    """Device-resident static per-point store (u/v/color/weights/
    energy_th).  Full upload on first use or after a wholesale rebuild
    (resume); incremental jitted scatter of freshly inserted rows
    otherwise (insert_points queues them in _pts_static_pending)."""
    p = self.pts
    dev = getattr(self, "_pts_static_dev", None)
    if dev is None:
        dev = dict(
            u=jnp.asarray(p.u), v=jnp.asarray(p.v),
            color=jnp.asarray(p.color), weights=jnp.asarray(p.weights),
            energy_th=jnp.asarray(p.energy_th),
        )
        self._pts_static_pending = []
    elif getattr(self, "_pts_static_pending", None):
        pend = self._pts_static_pending
        self._pts_static_pending = []
        idx = np.concatenate([np.asarray(sl, np.int64) for sl in pend])
        # ONE fixed scatter shape (chunked): a varying pad bucket would
        # recompile mid-run, which costs seconds on this device and lands
        # inside the optimize stage
        B = _PTS_SCATTER_CHUNK
        for o in range(0, len(idx), B):
            ch = idx[o:o + B]
            pad = B - len(ch)
            chp = np.concatenate([ch, np.full(pad, self.P, np.int64)]).astype(np.int32)
            dev = D.scatter_pts_static(
                dev, jnp.asarray(chp),
                jnp.asarray(np.concatenate([p.u[ch], np.zeros(pad, np.float32)])),
                jnp.asarray(np.concatenate([p.v[ch], np.zeros(pad, np.float32)])),
                jnp.asarray(np.concatenate(
                    [p.color[ch], np.zeros((pad, 8), np.float32)])),
                jnp.asarray(np.concatenate(
                    [p.weights[ch], np.zeros((pad, 8), np.float32)])),
                jnp.asarray(np.concatenate(
                    [p.energy_th[ch], np.zeros(pad, np.float32)])),
            )
    self._pts_static_dev = dev
    return dev


def _wo_pack_pts(self):
    p = self.pts
    return dict(
        u=jnp.asarray(p.u), v=jnp.asarray(p.v),
        idepth=jnp.asarray(p.idepth), idepth_zero=jnp.asarray(p.idepth_zero),
        color=jnp.asarray(p.color), weights=jnp.asarray(p.weights),
        host=jnp.asarray(p.host), energy_th=jnp.asarray(p.energy_th),
        prior=jnp.asarray(p.prior), active=jnp.asarray(p.active),
        idepth_hessian=jnp.asarray(p.idepth_hessian),
    )


def _wo_pack_res(self):
    p = self.pts
    energy = getattr(self, "_r_energy_dev", None)
    if energy is None:
        energy = jnp.asarray(p.r_energy)
    return dict(
        exists=jnp.asarray(p.r_exists),
        state=jnp.asarray(p.r_state.astype(np.int32)),
        active=jnp.asarray(p.r_active),
        linearized=jnp.asarray(p.r_linearized),
        energy=energy,
    )


GN_BUCKET_FLOOR = 2048  # smallest compaction bucket (tests shrink it)


def _gn_bucket_ladder(P: int) -> list[int]:
    """Compaction bucket sizes: powers of two plus 1.5x intermediates
    (ascending).  The intermediates matter because per-point work
    dominates the GN program -- n_live just over a power of two would
    otherwise pay a full 2x bucket (e.g. 4726 live -> 8192; with the
    ladder it runs at 6144, 25% less per-point work)."""
    cands = set()
    b = GN_BUCKET_FLOOR
    while b < P:
        cands.add(b)
        if GN_BUCKET_FLOOR <= b * 3 // 2 < P:
            cands.add(b * 3 // 2)
        b *= 2
    return sorted(cands)


def _wo_gn_bucket(self, n_live: int) -> int:
    """Smallest ladder bucket >= n_live (the full P disables compaction)."""
    for b in _gn_bucket_ladder(self.P):
        if b >= max(n_live, 1):
            return b
    return self.P


def _wo_gn_prepare(self, max_iters: int, bucket: int | None = None,
                   assigned_rows=None):
    # the device GN skips the L-system accumulation on the strength of
    # this invariant (see device_opt.solve_iteration)
    assert not self.pts.r_linearized.any(), (
        "live window carries FEJ-linearized residuals; the device GN "
        "assumes the L system is empty (fixLinearizationF is marg-only)")
    """Host half of the device GN call: the flat input push plus the meta
    the adoption needs.  Split out so a multi-sequence executor can stack
    several windows' inputs and run them as ONE vmapped program."""
    if self.n_frames < 3:
        max_iters = 20
    elif self.n_frames < 4:
        max_iters = 15
    if not hasattr(self, "_dev_opt") or self._dev_opt is None:
        self._dev_opt = D.make_device_optimizer_fused(self.s, self.F, self.P)
    # pre-call active set ("activeResiduals"): needed after the pull for
    # the lastResiduals / numGoodResiduals fix-time bookkeeping
    active_pre = self.pts.r_exists & ~self.pts.r_linearized
    states0 = np.zeros((self.F, 10), np.float32)
    for i, f in enumerate(self.frames):
        states0[i] = f.state
    f_eth0 = np.zeros(self.F, np.float32)
    for i, f in enumerate(self.frames):
        f_eth0[i] = f.frame_energy_th
    newest = self.n_frames - 1
    r_energy = getattr(self, "_r_energy_dev", None)
    if r_energy is None:
        r_energy = jnp.asarray(self.pts.r_energy)
    # active-slot compaction (device_opt.make_device_optimizer_compact):
    # every per-point op in the GN program scales with the slot count, and
    # only the slots with residuals (or an active flag) participate
    live = self.pts.r_exists.any(1) | self.pts.active
    rows_live = np.nonzero(live)[0].astype(np.int64)
    # the fused tail relinearizes ONLY the target==newest column on the
    # strength of this invariant: the just-inserted keyframe hosts no
    # points yet (its immature points are created after its own
    # makeKeyFrame), so the newest eval-point shift + f_eth update can
    # only affect residuals TARGETING it (device_opt fused-tail note)
    assert not (self.pts.host[rows_live] == newest).any(), (
        "live point hosted in the newest frame; the column-restricted "
        "final relinearize in the fused GN tail would be stale")
    if assigned_rows is not None and len(assigned_rows):
        # overlapped-activation path: the pre-assigned (still-free) target
        # slots ride along so the in-program merge can populate them; a
        # sorted union keeps the compact row order identical to what the
        # sequential adopt-then-dispatch path would produce
        rows = np.union1d(rows_live, np.asarray(assigned_rows, np.int64))
    else:
        rows = rows_live
    P_eff = bucket if bucket is not None else _wo_gn_bucket(self, len(rows))
    if P_eff >= self.P:
        P_eff = self.P
        idx = None
        flat, flat_u8 = _wo_gn_flat(self, states0, f_eth0)
    else:
        idx = np.full(P_eff, self.P, np.int32)
        idx[: len(rows)] = rows
        flat, flat_u8 = _wo_gn_flat(self, states0, f_eth0, rows, P_eff)
    return flat, flat_u8, idx, _wo_pts_static(self), r_energy, dict(
        active_pre=active_pre, newest=newest, max_iters=max_iters,
        live_rows=rows, P_eff=P_eff)


def _wo_optimize_device(self, max_iters: int) -> float:
    """optimize() + final relinearization as ONE device program."""
    if self.n_frames < 2:
        return 0.0
    t0 = time.perf_counter()
    flat_in, flat_u8, idx, pts_static, r_energy, meta = _wo_gn_prepare(
        self, max_iters)
    t1 = time.perf_counter()
    # ONE dynamic f32 push + one packed u8 push (statics live on device);
    # r_energy stays device-resident between KFs
    if idx is None:
        out = self._dev_opt.flat(
            self.images, self.jstore, jnp.asarray(flat_in),
            jnp.asarray(flat_u8), pts_static, r_energy,
            jnp.int32(meta["max_iters"]), jnp.int32(meta["newest"]),
            self.quads,
        )
        jst, ren, cen = out["jstore"], out["res"]["energy"], out["center_newest"]
    else:
        fn = D.make_device_optimizer_compact(self.s, self.F, self.P,
                                             meta["P_eff"])
        out = fn(
            self.images, self.jstore, jnp.asarray(flat_in),
            jnp.asarray(flat_u8), jnp.asarray(idx), pts_static, r_energy,
            jnp.int32(meta["max_iters"]), jnp.int32(meta["newest"]),
            self.quads,
        )
        jst, ren, cen = out["jstore"], out["r_energy"], out["center_newest"]
    t2 = time.perf_counter()
    # sync with ONE flat pull (every extra D2H pull costs a ~30 ms tunnel
    # round trip): [small | newR | newt | pts_pack | res_bits]
    flat_np = np.asarray(out["flat"])
    t3 = time.perf_counter()
    rmse = _wo_gn_adopt(self, flat_np, jst, ren, cen, meta)
    stage = getattr(self, "stage_ms", None)
    if stage is not None:
        stage["opt_prepare"] = 1000.0 * (t1 - t0)
        stage["opt_dispatch"] = 1000.0 * (t2 - t1)
        stage["opt_wait"] = 1000.0 * (t3 - t2)
        stage["opt_adopt"] = 1000.0 * (time.perf_counter() - t3)
    return rmse


def _wo_gn_dispatch_overlapped(self, max_iters: int, act_flat_dev,
                               imm_static, assigned_slots, act_A: int):
    """Dispatch the window GN with the device-side activation merge
    (device_opt.make_gn_with_activation) WITHOUT waiting for the
    activation pull: the host pre-assigns the free point slots the
    accepted candidates will land in, the program gathers their static
    rows from the immature store and wires their residuals on device,
    and the caller overlaps its mirror bookkeeping (from the activation
    flat, whose D2H completes as soon as the activation program finishes
    — while this GN is still computing) with the GN's device time.

    Returns (out, meta); finish with gn_finish(out, meta)."""
    t0 = time.perf_counter()
    n_assign = len(assigned_slots)
    flat_in, flat_u8, idx, pts_static, r_energy, meta = _wo_gn_prepare(
        self, max_iters, assigned_rows=assigned_slots)
    # compact positions of the r-th assigned slot (rank order); full-P
    # path: the slot ids themselves
    if idx is None:
        sentinel = self.P
        pos = np.asarray(assigned_slots, np.int32)
        fn = D.make_gn_with_activation(
            self.s, self.F, self.P, self.s.max_immature_per_frame)
        args = (self.images, self.jstore, jnp.asarray(flat_in),
                jnp.asarray(flat_u8), pts_static, r_energy)
    else:
        sentinel = meta["P_eff"]
        pos = np.searchsorted(meta["live_rows"],
                              np.asarray(assigned_slots)).astype(np.int32)
        fn = D.make_gn_with_activation(
            self.s, self.F, self.P, self.s.max_immature_per_frame,
            meta["P_eff"])
        args = (self.images, self.jstore, jnp.asarray(flat_in),
                jnp.asarray(flat_u8), jnp.asarray(idx), pts_static,
                r_energy)
    # pad the rank->row table to the activation program's A capacity with
    # drop sentinels (rank >= n_assign -> dropped by the merge scatter)
    pos_full = np.full(act_A, sentinel, np.int32)
    pos_full[:n_assign] = pos
    t1 = time.perf_counter()
    out = fn(*args, jnp.int32(meta["max_iters"]), jnp.int32(meta["newest"]),
             self.quads, act_flat_dev, imm_static, jnp.asarray(pos_full))
    meta["assigned_slots"] = np.asarray(assigned_slots)
    meta["n_assign"] = n_assign
    stage = getattr(self, "stage_ms", None)
    if stage is not None:
        stage["opt_prepare"] = 1000.0 * (t1 - t0)
        stage["opt_dispatch"] = 1000.0 * (time.perf_counter() - t1)
    return out, meta


def _wo_gn_finish(self, out, meta) -> float:
    """Blocking pull + adopt of a previously dispatched GN program."""
    t2 = time.perf_counter()
    flat_np = np.asarray(out["flat"])
    t3 = time.perf_counter()
    if "r_energy" in out:
        jst, ren, cen = out["jstore"], out["r_energy"], out["center_newest"]
    else:
        jst, ren, cen = (out["jstore"], out["res"]["energy"],
                         out["center_newest"])
    rmse = _wo_gn_adopt(self, flat_np, jst, ren, cen, meta)
    stage = getattr(self, "stage_ms", None)
    if stage is not None:
        stage["opt_wait"] = stage.get("opt_wait", 0.0) + 1000.0 * (t3 - t2)
        stage["opt_adopt"] = 1000.0 * (time.perf_counter() - t3)
    return rmse


WindowOptimizer.gn_dispatch_overlapped = _wo_gn_dispatch_overlapped
WindowOptimizer.gn_finish = _wo_gn_finish


def _wo_gn_adopt(self, flat, jstore_dev, r_energy_dev, center_dev, meta):
    """Adopt the GN program's flat pull + device-resident outputs.

    flat must be the RAW f32 pull: the res_bits tail is bitcast-packed
    uint8 quadruples whose f32 bit patterns do not survive a float64
    conversion (device_opt gn tail)."""
    flat = np.ascontiguousarray(np.asarray(flat, np.float32))
    newest = meta["newest"]
    active_pre = meta["active_pre"]
    self.jstore = jstore_dev
    F, P = self.F, self.P
    Pe = meta.get("P_eff", P)
    n_small = 6 + F + 10 * F
    small_np = flat[:n_small].astype(np.float64)
    o = n_small
    newR = flat[o:o + 9].astype(np.float64).reshape(3, 3); o += 9
    newt = flat[o:o + 3].astype(np.float64); o += 3
    pts_pack = flat[o:o + Pe * 3].reshape(Pe, 3); o += Pe * 3
    bits = (flat[o:o + Pe * F // 4].view(np.uint8)
            .reshape(Pe, F).astype(np.int32))
    if Pe < P:
        # compacted pull: scatter the live rows back into the full-P host
        # arrays.  Excluded slots have no residuals and are inactive, so
        # the full program would leave them untouched except
        # idepth_hessian <- 0 (ngood == 0 in solve_iteration).
        rows = meta["live_rows"]
        n_live = len(rows)
        pp = np.zeros((P, 3), np.float32)
        pp[rows] = pts_pack[:n_live]
        pts_pack_full = pp
        bits_full = np.zeros((P, F), np.int32)
        bits_full[rows] = bits[:n_live]
        excl = np.ones(P, bool)
        excl[rows] = False
    else:
        pts_pack_full, bits_full, excl, rows = pts_pack, bits, None, None
    pts_pack, bits = pts_pack_full, bits_full

    self.last_energy = float(small_np[0])
    self.res_in_a = max(int(small_np[1]), 1)
    self.calib_value = small_np[2:6].copy()
    f_eth = small_np[6 : 6 + self.F]
    states = small_np[6 + self.F :].reshape(self.F, 10)
    # newest eval point: pulled pose, re-orthonormalized into SO(3)
    U, _, Vt = np.linalg.svd(newR)
    newR = U @ np.diag([1.0, 1.0, np.linalg.det(U @ Vt)]) @ Vt
    for i, f in enumerate(self.frames):
        f.frame_energy_th = float(f_eth[i])
        if i == newest:
            zero = states[i].copy()
            zero[:6] = 0
            f.set_eval_pt(SE3(newR, newt), zero)
        else:
            f.set_state(states[i])
    self.set_adjoints()

    p = self.pts
    if excl is None:
        p.idepth = pts_pack[:, 0].astype(np.float32)
        p.idepth_zero = pts_pack[:, 1].astype(np.float32)
        p.idepth_hessian = pts_pack[:, 2].astype(np.float32)
        p.r_exists = (bits & 1).astype(bool)
        p.r_state = ((bits >> 1) & 3).astype(np.int8)
        p.r_active = ((bits >> 3) & 1).astype(bool)
        p.r_linearized = ((bits >> 4) & 1).astype(bool)
    else:
        # compacted: excluded slots keep their host values (the full
        # program leaves them unchanged), except idepth_hessian which the
        # full program zeroes for every ngood == 0 slot
        p.idepth[rows] = pts_pack[rows, 0].astype(np.float32)
        p.idepth_zero[rows] = pts_pack[rows, 1].astype(np.float32)
        p.idepth_hessian[rows] = pts_pack[rows, 2].astype(np.float32)
        p.idepth_hessian[excl] = 0.0
        p.r_exists[rows] = (bits[rows] & 1).astype(bool)
        p.r_state[rows] = ((bits[rows] >> 1) & 3).astype(np.int8)
        p.r_active[rows] = ((bits[rows] >> 3) & 1).astype(bool)
        p.r_linearized[rows] = ((bits[rows] >> 4) & 1).astype(bool)
    # fix-time bookkeeping (reference FullSystemOptimize.cpp:58-80,172-181):
    # lastResiduals state recording from the pre-drop state, and
    # numGoodResiduals for new residuals that came out IN
    state_rec = ((bits >> 5) & 3).astype(np.int8)
    for k1, col in ((0, newest), (1, newest - 1)):
        if col >= 0:
            mrec = active_pre[:, col]
            p.last_res_state[mrec, k1] = state_rec[mrec, col]
    isnew = p.r_is_new & active_pre & (p.r_state == RES_IN) & p.r_exists
    if isnew.any():
        p.num_good_res += isnew.sum(1).astype(np.int32)
    p.r_is_new &= ~active_pre
    # r_energy and the newest-column center projections stay device-resident
    self._r_energy_dev = r_energy_dev
    self._center_newest_dev = center_dev
    rmse = float(np.sqrt(self.last_energy / (8.0 * self.res_in_a)))

    lock = getattr(self, "shell_lock", None)
    if lock is not None:
        lock.acquire()
    try:
        for f in self.frames:
            if f.shell is not None:
                f.shell.camToWorld = f.PRE_camToWorld
                f.shell.aff_g2l = f.aff_g2l()
    finally:
        if lock is not None:
            lock.release()
    return rmse


def _wo_precompile(self):
    """Warm every per-KF device program on dummy (zero) inputs.

    The first invocation of each compiled program costs seconds on the
    bench device (XLA compile or persistent-cache load + executable
    upload), and without this the costs land mid-run: the first frame
    marginalization around the 6th keyframe, the first point
    marginalization, the first full-window GN.  Paying them all at init
    keeps multi-second stalls out of the steady-state frame loop.  All
    shapes are fixed at construction, so zero inputs trace identically."""
    F, P = self.F, self.P
    f32 = jnp.float32
    if getattr(self, "_dev_opt", None) is None:
        self._dev_opt = D.make_device_optimizer_fused(self.s, F, P)
    fl0, u80 = _wo_gn_flat(self, np.zeros((F, 10), np.float32),
                           np.zeros(F, np.float32))
    out = self._dev_opt.flat(
        self.images, self.jstore, jnp.asarray(fl0), jnp.asarray(u80),
        _wo_pts_static(self),
        jnp.zeros((P, F), f32), jnp.int32(1), jnp.int32(0), self.quads,
    )
    # warm every compaction bucket the run can pick (each is its own
    # compiled program; a cold one landing mid-run costs seconds)
    outs_c = []
    rows0 = np.zeros(0, np.int64)
    for b in _gn_bucket_ladder(P):
        flc, u8c = _wo_gn_flat(self, np.zeros((F, 10), np.float32),
                               np.zeros(F, np.float32), rows0, b)
        fn = D.make_device_optimizer_compact(self.s, F, P, b)
        outs_c.append(fn(
            self.images, self.jstore, jnp.asarray(flc), jnp.asarray(u8c),
            jnp.full(b, P, jnp.int32), _wo_pts_static(self),
            jnp.zeros((P, F), f32), jnp.int32(1), jnp.int32(0), self.quads,
        ))
    # warm the (single) static-store scatter shape
    B = _PTS_SCATTER_CHUNK
    D.scatter_pts_static(
        _wo_pts_static(self), jnp.full(B, P, jnp.int32),
        jnp.zeros(B, f32), jnp.zeros(B, f32),
        jnp.zeros((B, 8), f32), jnp.zeros((B, 8), f32),
        jnp.zeros(B, f32),
    )
    marg = D.make_marg_points(self.s, F, P)(
        self.jstore, jnp.zeros((P, F), bool), jnp.asarray(self.pts.host),
        jnp.zeros(P, f32), jnp.zeros((F, F, 8, 8), f32),
        jnp.zeros((F, F, 8, 8), f32),
    )
    # warm the async D2H transfer path too: the FIRST copy_to_host_async
    # on this runtime costs ~360 ms (lazy transfer-manager setup) and
    # otherwise lands inside the first real point-marg (KF4-class)
    try:
        marg.copy_to_host_async()
    except AttributeError:
        pass
    ins = _set_image_slot(self.images, self.quads, jnp.int32(0),
                          jnp.zeros(self.images.shape[1:], jnp.float32))
    perm = jnp.asarray(list(range(F)))
    js, im, qd = _permute_stores(self.jstore, self.images, self.quads, perm)
    re_ = _permute_cols(jnp.zeros((P, F), f32), perm)
    jax.block_until_ready((out, outs_c, marg, js, im, qd, re_, ins))


WindowOptimizer.precompile = _wo_precompile


def _wo_sync_r_energy(self):
    if getattr(self, "_r_energy_dev", None) is not None:
        self.pts.r_energy = np.array(self._r_energy_dev)
    return self.pts.r_energy


WindowOptimizer.sync_r_energy = _wo_sync_r_energy
WindowOptimizer.device_inputs = _wo_device_inputs
WindowOptimizer.pack_pts = _wo_pack_pts
WindowOptimizer.pack_res = _wo_pack_res
WindowOptimizer.optimize_device = _wo_optimize_device
WindowOptimizer.gn_prepare = _wo_gn_prepare
WindowOptimizer.gn_adopt = _wo_gn_adopt
WindowOptimizer._dev_opt = None
