"""Monocular two-frame bootstrap.

Rebuild of CoarseInitializer (reference: src/FullSystem/CoarseInitializer.cpp):
joint coarse-to-fine LM over SE3 pose + affine + per-point inverse depth,
with the point block eliminated by Schur complement (JbBuffer / acc9SC
machinery, :338-610), neighbor-median idepth regularization (optReg :656),
inter-level propagation (:695-765) and the alphaW/alphaK translation "snap"
test (:92-93, :217-221, :551-576).

TPU split: the per-point pattern warp + residual + Jacobian + the 9x9 and
Schur reductions are one fused jitted kernel per pyramid level (vmapped over
points, einsum reductions); the tiny 8x8 solve, idepth steps, neighbor
regularization and level propagation run on the host in numpy -- the
initializer executes once per sequence start, so dispatch latency is
irrelevant, but the O(P) image work still rides the TPU.

The reference's wM scaling and the 0.01/(w*h) factor cancel inside the
solve (diagonal scaling of a damped-diagonal system); we solve unscaled with
Jacobi preconditioning and measure the convergence norm on the applied
increment exactly as trackFrame does (:178 inc includes the wM factor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from ..config import PATTERN, Settings
from ..geometry import SE3, PyramidCalib
from ..ops.interp import build_quad, interp1q, interp3, interp3q
from .pixel_selector import PixelSelector, make_pixel_status

_ALPHA_K = 2.5 * 2.5
_ALPHA_W = 150.0 * 150.0
_REG_WEIGHT = 0.8
_COUPLING_WEIGHT = 1.0
_MAX_ITERATIONS = (5, 5, 10, 30, 50, 50)
_DENSITIES = (0.03, 0.05, 0.15, 0.5, 1.0, 1.0)


@partial(jax.jit, static_argnames=("huber_th",))
def _calc_res_gs(
    ref_dI, new_dI,            # (H,W,3) each
    u, v, idepth_new, is_good, energy_old, iR, outlier_th, valid,  # (P,)
    R, t, aff_exp,             # pose + (exp(a), b)
    K,                         # (fx, fy, cx, cy)
    snapped,                   # bool scalar
    huber_th: float,
    new_quad=None, ref_quad0=None,   # prebuilt quad tables: REQUIRED by
                                     # loop-body callers (build_quad note)
):
    """Fused calcResAndGS (reference :338-610).  Returns reduced systems and
    per-point updates."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    h, w = new_dI.shape[:2]
    P = u.shape[0]
    pat = jnp.asarray(PATTERN, jnp.float32)  # (8,2)

    up = u[:, None] + pat[None, :, 0]
    vp = v[:, None] + pat[None, :, 1]
    ray = jnp.stack(
        [(up - cx) / fx, (vp - cy) / fy, jnp.ones_like(up)], axis=-1
    )  # (P,8,3)
    pt = jnp.einsum("ij,pkj->pki", R, ray, precision="highest") + t[None, None, :] * idepth_new[:, None, None]
    iz = 1.0 / pt[..., 2]
    un = pt[..., 0] * iz
    vn = pt[..., 1] * iz
    Ku = fx * un + cx
    Kv = fy * vn + cy
    new_id = idepth_new[:, None] * iz

    inb = (Ku > 1) & (Kv > 1) & (Ku < w - 2) & (Kv < h - 2) & (new_id > 0)

    if new_quad is None:
        new_quad = build_quad(new_dI)
    if ref_quad0 is None:
        ref_quad0 = build_quad(ref_dI[..., 0])
    hit = interp3q(new_quad, h, w, Ku, Kv)          # (P,8,3)
    rlR = interp1q(ref_quad0, h, w, up, vp)         # (P,8) intensity only
    finite = jnp.isfinite(hit[..., 0]) & jnp.isfinite(rlR)
    ok_pix = inb & finite
    point_ok = valid & is_good & jnp.all(ok_pix, axis=1)

    residual = hit[..., 0] - aff_exp[0] * rlR - aff_exp[1]
    absr = jnp.abs(residual)
    hw = jnp.where(absr < huber_th, 1.0, huber_th / jnp.maximum(absr, 1e-12))
    energy_pat = hw * residual * residual * (2.0 - hw)
    energy = jnp.sum(jnp.where(ok_pix, energy_pat, 0.0), axis=1)

    is_good_new = point_ok & (energy <= outlier_th * 20.0)

    # Jacobians (reference :436-466); sqrt-weighted like the reference
    dxdd = (t[0] - t[2] * un) * iz
    dydd = (t[1] - t[2] * vn) * iz
    hw_s = jnp.where(hw < 1.0, jnp.sqrt(hw), hw)
    dxi = hw_s * hit[..., 1] * fx
    dyi = hw_s * hit[..., 2] * fy
    J = jnp.stack(
        [
            new_id * dxi,
            new_id * dyi,
            -new_id * (un * dxi + vn * dyi),
            -un * vn * dxi - (1.0 + vn * vn) * dyi,
            (1.0 + un * un) * dxi + un * vn * dyi,
            -vn * dxi + un * dyi,
            -hw_s * aff_exp[0] * rlR,
            -hw_s,
        ],
        axis=-1,
    )  # (P,8pat,8)
    dd = dxi * dxdd + dyi * dydd            # (P,8)
    r_w = hw_s * residual

    gmask = is_good_new.astype(jnp.float32)[:, None]
    Jm = J * gmask[..., None]
    ddm = dd * gmask
    rm = r_w * gmask

    # acc9: [J | r]^T [J | r] summed over good points and pattern
    v9 = jnp.concatenate([Jm, rm[..., None]], axis=-1).reshape(-1, 9)
    acc9 = jnp.einsum("pi,pj->ij", v9, v9, precision="highest")
    H_out = acc9[:8, :8]
    b_out = acc9[:8, 8]

    # JbBuffer_new (reference :470-481): per-point [J.dd (8), r.dd, dd.dd]
    Jb = jnp.concatenate(
        [
            jnp.einsum("pki,pk->pi", Jm, ddm, precision="highest"),
            jnp.einsum("pk,pk->p", rm, ddm, precision="highest")[:, None],
            jnp.einsum("pk,pk->p", ddm, ddm, precision="highest")[:, None],
        ],
        axis=-1,
    )  # (P,10)
    last_hessian_new = Jb[:, 9]

    # maxstep (reference :468): min over pattern of 1/|(dxdd*fx, dydd*fy)|
    step_den = jnp.sqrt((dxdd * fx) ** 2 + (dydd * fy) ** 2)
    maxstep = jnp.min(
        jnp.where(ok_pix, 1.0 / jnp.maximum(step_den, 1e-12), 1e10), axis=1
    )
    maxstep = jnp.where(is_good_new, jnp.minimum(maxstep, 1e10), 1e10)

    # energy accumulator E: good -> new energy, bad -> old energy[0];
    # plus the (idepth-1)^2 terms (reference :519-545 adds them to E too)
    npts = jnp.sum(valid.astype(jnp.float32))
    e_reg_new = (idepth_new - 1.0) ** 2
    E_A = jnp.sum(
        jnp.where(valid,
                  jnp.where(is_good_new, energy, energy_old[:, 0])
                  + jnp.where(is_good_new, e_reg_new, energy_old[:, 1]),
                  0.0)
    )
    E_num = 2.0 * npts

    t_norm2 = jnp.sum(t * t)
    alpha_energy_raw = _ALPHA_W * t_norm2 * npts
    capped = alpha_energy_raw > _ALPHA_K * npts
    alpha_energy = jnp.where(capped, _ALPHA_K * npts, alpha_energy_raw)
    alpha_opt = jnp.where(capped, 0.0, _ALPHA_W)

    # Schur part with alpha/coupling regularizers folded in (:578-601)
    Jb8 = Jb[:, 8] + alpha_opt * (idepth_new - 1.0)
    Jb9 = Jb[:, 9] + alpha_opt
    couple = jnp.where(capped, _COUPLING_WEIGHT, 0.0)
    Jb8 = Jb8 + couple * (idepth_new - iR)
    Jb9 = Jb9 + couple
    Jb9i = 1.0 / (1.0 + Jb9)

    v9sc = jnp.concatenate([Jb[:, :8], Jb8[:, None]], axis=-1) * gmask
    wsc = Jb9i * gmask[:, 0]
    acc9sc = jnp.einsum("pi,pj,p->ij", v9sc, v9sc, wsc, precision="highest")
    Hsc = acc9sc[:8, :8]
    bsc = acc9sc[:8, 8]

    Jb_new = jnp.concatenate([Jb[:, :8], Jb8[:, None], Jb9i[:, None]], axis=-1)

    # alpha terms on the top system (reference :604-611)
    diag_add = alpha_opt * npts

    return dict(
        H=H_out, b=b_out, Hsc=Hsc, bsc=bsc,
        E_A=E_A, E_num=E_num, alpha_energy=alpha_energy, capped=capped,
        is_good_new=is_good_new, energy_new=energy, e_reg_new=e_reg_new,
        Jb_new=Jb_new, last_hessian_new=last_hessian_new, maxstep=maxstep,
        diag_add=diag_add, npts=npts,
    )


class CoarseInitializer:
    def __init__(self, calib: PyramidCalib, settings: Settings | None = None):
        self.calib = calib
        self.s = settings or Settings()
        self.levels = calib.levels
        self.frame_id = -1
        self.snapped = False
        self.snapped_at = 0
        self.this_to_next = SE3()
        self.this_to_next_aff = np.zeros(2)
        self.first_dIs = None
        self.pts = None  # per-level dict of numpy arrays

    # ------------------------------------------------------------------
    def set_first(self, dIs, absgrads, exposure: float = 1.0):
        """Select points on the first frame and build the NN graph
        (reference setFirst :793-876 + makeNN :992)."""
        c = self.calib
        s = self.s
        self.first_dIs = dIs
        self.first_exposure = exposure
        sel = PixelSelector(c.w[0], c.h[0], s)
        w0h0 = c.w[0] * c.h[0]
        self.pts = []
        for lvl in range(self.levels):
            if lvl == 0:
                sel.current_potential = 3
                status = sel.make_maps(
                    np.asarray(dIs[0]), [np.asarray(a) for a in absgrads],
                    _DENSITIES[0] * w0h0, recursions_left=1, th_factor=2.0,
                    frame_id=0,
                )
                ys, xs = np.nonzero(status)
                types = status[ys, xs]
            else:
                smap, _ = make_pixel_status(
                    np.asarray(dIs[lvl]), _DENSITIES[min(lvl, 5)] * w0h0
                )
                ys, xs = np.nonzero(smap)
                types = np.ones(len(ys), np.float32)
            # pattern-padding border exclusion (reference :817-819)
            w, h = c.w[lvl], c.h[lvl]
            keep = (xs >= 3) & (xs < w - 4) & (ys >= 3) & (ys < h - 4)
            xs, ys, types = xs[keep], ys[keep], types[keep]
            n = len(xs)
            pad = max(256, int(np.ceil(n / 256.0)) * 256)
            d = dict(
                n=n,
                u=np.zeros(pad, np.float32), v=np.zeros(pad, np.float32),
                my_type=np.zeros(pad, np.float32),
                valid=np.zeros(pad, bool),
                idepth=np.ones(pad, np.float32),
                idepth_new=np.ones(pad, np.float32),
                iR=np.ones(pad, np.float32),
                energy=np.zeros((pad, 2), np.float32),
                is_good=np.ones(pad, bool),
                last_hessian=np.zeros(pad, np.float32),
                maxstep=np.full(pad, 1e10, np.float32),
                outlier_th=np.full(pad, 8.0 * s.outlier_th, np.float32),
                Jb=np.zeros((pad, 10), np.float32),
            )
            d["u"][:n] = xs + 0.1
            d["v"][:n] = ys + 0.1
            d["my_type"][:n] = types
            d["valid"][:n] = True
            self.pts.append(d)

        # NN graph: 10 neighbors in-level, parent in next-coarser level
        for lvl in range(self.levels):
            d = self.pts[lvl]
            n = d["n"]
            pad = len(d["u"])
            d["neighbours"] = np.full((pad, 10), -1, np.int64)
            d["parent"] = np.full(pad, -1, np.int64)
            if n == 0:
                continue
            xy = np.stack([d["u"][:n], d["v"][:n]], axis=1)
            tree = cKDTree(xy)
            k = min(11, n)
            _, idx = tree.query(xy, k=k)
            idx = np.atleast_2d(idx)
            d["neighbours"][:n, : k - 1] = idx[:, 1:k]
            if lvl + 1 < self.levels:
                dp = self.pts[lvl + 1]
                npar = dp["n"]
                if npar > 0:
                    ptree = cKDTree(
                        np.stack([dp["u"][:npar] * 2, dp["v"][:npar] * 2], axis=1)
                    )
                    _, pidx = ptree.query(xy, k=1)
                    d["parent"][:n] = pidx
        self.this_to_next = SE3()
        self.snapped = False
        self.frame_id = 0
        self.snapped_at = 0
        self._push_device_state()

    # ------------------------------------------------------------------
    # Device-resident fast path (initializer_dev.py)
    # ------------------------------------------------------------------
    def _push_device_state(self):
        self.dev = []
        for lvl in range(self.levels):
            d = self.pts[lvl]
            self.dev.append({
                k: jnp.asarray(d[k]) for k in (
                    "u", "v", "valid", "neighbours", "parent", "idepth",
                    "idepth_new", "iR", "energy", "is_good", "last_hessian",
                    "maxstep", "outlier_th", "Jb")
            })
        self._level_lm = None

    def _pull_level(self, lvl):
        d = self.pts[lvl]
        for k in ("idepth", "idepth_new", "iR", "is_good", "last_hessian",
                  "maxstep"):
            d[k] = np.array(self.dev[lvl][k])
        return d

    # ------------------------------------------------------------------
    def _opt_reg(self, lvl):
        """iR <- (1-w)*idepth + w*median(neighbor iR) (reference optReg)."""
        d = self.pts[lvl]
        if not self.snapped:
            d["iR"][:] = 1.0
            return
        n = d["n"]
        if n == 0:
            return
        nb = d["neighbours"][:n]
        nb_ok = (nb >= 0) & d["is_good"][np.clip(nb, 0, None)]
        nb_iR = np.where(nb_ok, d["iR"][np.clip(nb, 0, None)], np.nan)
        nnn = nb_ok.sum(1)
        srt = np.sort(np.where(np.isnan(nb_iR), np.inf, nb_iR), axis=1)
        med = srt[np.arange(n), np.minimum(nnn // 2, 9)]
        upd = d["is_good"][:n] & (nnn > 2)
        d["iR"][:n] = np.where(
            upd, (1 - _REG_WEIGHT) * d["idepth"][:n] + _REG_WEIGHT * med, d["iR"][:n]
        )

    def _reset_points(self, lvl):
        d = self.pts[lvl]
        n = d["n"]
        d["energy"][:] = 0
        d["idepth_new"][:] = d["idepth"]
        if lvl == self.levels - 1 and n > 0:
            bad = ~d["is_good"][:n]
            nb = d["neighbours"][:n]
            nb_ok = (nb >= 0) & d["is_good"][np.clip(nb, 0, None)]
            nb_iR = np.where(nb_ok, d["iR"][np.clip(nb, 0, None)], 0.0)
            sn = nb_ok.sum(1)
            snd = nb_iR.sum(1)
            fix = bad & (sn > 0)
            val = np.where(sn > 0, snd / np.maximum(sn, 1), 1.0)
            d["is_good"][:n] |= fix
            for key in ("iR", "idepth", "idepth_new"):
                d[key][:n] = np.where(fix, val, d[key][:n])

    def _propagate_down(self, src_lvl):
        ds = self.pts[src_lvl]
        dt = self.pts[src_lvl - 1]
        n = dt["n"]
        if n == 0 or ds["n"] == 0:
            return
        par = np.clip(dt["parent"][:n], 0, None)
        p_good = ds["is_good"][par] & (ds["last_hessian"][par] >= 0.1) & (dt["parent"][:n] >= 0)
        p_iR = ds["iR"][par]
        child_bad = ~dt["is_good"][:n]
        # bad child: adopt parent iR
        adopt = p_good & child_bad
        for key in ("iR", "idepth", "idepth_new"):
            dt[key][:n] = np.where(adopt, p_iR, dt[key][:n])
        dt["is_good"][:n] |= adopt
        dt["last_hessian"][:n] = np.where(adopt, 0.0, dt["last_hessian"][:n])
        # good child: hessian-weighted blend
        blend = p_good & ~child_bad
        wch = dt["last_hessian"][:n] * 2
        wpa = ds["last_hessian"][par]
        newiR = (dt["iR"][:n] * wch + p_iR * wpa) / np.maximum(wch + wpa, 1e-12)
        for key in ("iR", "idepth", "idepth_new"):
            dt[key][:n] = np.where(blend, newiR, dt[key][:n])
        self._opt_reg(src_lvl - 1)

    def _propagate_up(self, src_lvl):
        ds = self.pts[src_lvl]
        dt = self.pts[src_lvl + 1]
        ns, nt = ds["n"], dt["n"]
        if ns == 0 or nt == 0:
            return
        iR_sum = np.zeros(nt)
        w_sum = np.zeros(nt)
        par = ds["parent"][:ns]
        good = ds["is_good"][:ns] & (par >= 0)
        np.add.at(iR_sum, par[good], (ds["iR"][:ns] * ds["last_hessian"][:ns])[good])
        np.add.at(w_sum, par[good], ds["last_hessian"][:ns][good])
        upd = w_sum > 0
        val = iR_sum / np.maximum(w_sum, 1e-12)
        dt["iR"][:nt] = np.where(upd, val, dt["iR"][:nt])
        dt["idepth"][:nt] = np.where(upd, val, dt["idepth"][:nt])
        dt["is_good"][:nt] |= upd
        self._opt_reg(src_lvl + 1)

    def _calc_ec(self, lvl):
        """Coupling energy old/new (reference calcEC)."""
        d = self.pts[lvl]
        n = d["n"]
        if not self.snapped or n == 0:
            return 0.0, 0.0
        g = d["is_good"][:n]
        r_old = (d["idepth"][:n] - d["iR"][:n])[g]
        r_new = (d["idepth_new"][:n] - d["iR"][:n])[g]
        return _COUPLING_WEIGHT * float((r_old**2).sum()), _COUPLING_WEIGHT * float((r_new**2).sum())

    # ------------------------------------------------------------------
    def track_frame(self, new_dIs, exposure: float = 1.0) -> bool:
        """Device-resident LM pyramid descent (one call per level)."""
        from . import initializer_dev as IDV

        s = self.s
        c = self.calib
        fix_affine = s.affine_opt_mode_a < 0 and s.affine_opt_mode_b < 0
        if self._level_lm is None:
            self._level_lm = [
                IDV.make_level_lm(
                    lvl,
                    (float(c.fx[lvl]), float(c.fy[lvl]), float(c.cx[lvl]), float(c.cy[lvl])),
                    self.first_dIs[lvl], s.huber_th, fix_affine,
                )
                for lvl in range(self.levels)
            ]

        if not self.snapped:
            self.this_to_next = SE3(self.this_to_next.R, np.zeros(3))
            for lvl in range(self.levels):
                dd = self.dev[lvl]
                self.dev[lvl] = dict(
                    dd, iR=jnp.ones_like(dd["iR"]),
                    idepth_new=jnp.ones_like(dd["idepth_new"]),
                    last_hessian=jnp.zeros_like(dd["last_hessian"]),
                )

        R = jnp.asarray(self.this_to_next.R, jnp.float32)
        t = jnp.asarray(self.this_to_next.t, jnp.float32)
        aff = self.this_to_next_aff.copy()
        if self.first_exposure > 0 and exposure > 0:
            aff = np.array([np.log(exposure / self.first_exposure), 0.0])
        aff = jnp.asarray(aff, jnp.float32)
        snapped = jnp.asarray(self.snapped)

        for lvl in range(self.levels - 1, -1, -1):
            if lvl < self.levels - 1:
                self.dev[lvl] = IDV.propagate_down(self.dev[lvl + 1], self.dev[lvl])
            st = IDV.reset_points(self.dev[lvl], top_level=(lvl == self.levels - 1))
            R, t, aff, st, snapped = self._level_lm[lvl](
                new_dIs[lvl], st, R, t, aff, snapped
            )
            self.dev[lvl] = st

        for lvl in range(self.levels - 1):
            self.dev[lvl + 1] = IDV.propagate_up(self.dev[lvl], self.dev[lvl + 1])

        self.this_to_next = SE3(np.array(R, np.float64), np.array(t, np.float64))
        self.this_to_next_aff = np.array(aff, np.float64)
        self.snapped = bool(snapped)

        self.frame_id += 1
        if not self.snapped:
            self.snapped_at = 0
        if self.snapped and self.snapped_at == 0:
            self.snapped_at = self.frame_id
        done = self.snapped and self.frame_id > self.snapped_at + 5
        if done:
            self._pull_level(0)
        return done

    def track_frame_host(self, new_dIs, exposure: float = 1.0) -> bool:
        """One LM pyramid descent against the first frame (reference :81-285).
        Returns True when snapped for > 5 frames (initialization done).
        Float64 host path kept for validation."""
        s = self.s
        c = self.calib
        fix_affine = s.affine_opt_mode_a < 0 and s.affine_opt_mode_b < 0

        if not self.snapped:
            self.this_to_next = SE3(self.this_to_next.R, np.zeros(3))
            for d in self.pts:
                d["iR"][:] = 1.0
                d["idepth_new"][:] = 1.0
                d["last_hessian"][:] = 0.0

        R = self.this_to_next.R.copy()
        t = self.this_to_next.t.copy()
        aff = self.this_to_next_aff.copy()
        if self.first_exposure > 0 and exposure > 0:
            aff = np.array([np.log(exposure / self.first_exposure), 0.0])

        for lvl in range(self.levels - 1, -1, -1):
            if lvl < self.levels - 1:
                self._propagate_down(lvl + 1)
            d = self.pts[lvl]
            if d["n"] == 0:
                continue
            self._reset_points(lvl)
            K = (float(c.fx[lvl]), float(c.fy[lvl]), float(c.cx[lvl]), float(c.cy[lvl]))

            def ev(R_, t_, aff_):
                out = _calc_res_gs(
                    self.first_dIs[lvl], new_dIs[lvl],
                    jnp.asarray(d["u"]), jnp.asarray(d["v"]),
                    jnp.asarray(d["idepth_new"]), jnp.asarray(d["is_good"]),
                    jnp.asarray(d["energy"]), jnp.asarray(d["iR"]),
                    jnp.asarray(d["outlier_th"]), jnp.asarray(d["valid"]),
                    jnp.asarray(R_, jnp.float32), jnp.asarray(t_, jnp.float32),
                    jnp.asarray([np.exp(aff_[0]), aff_[1]], jnp.float32),
                    jnp.asarray(K, jnp.float32),
                    jnp.asarray(self.snapped),
                    huber_th=s.huber_th,
                )
                return {k: np.asarray(val) for k, val in out.items()}

            r = ev(R, t, aff)
            self._apply_step(lvl, r)
            lam = 0.1
            fails = 0
            it = 0
            max_it = _MAX_ITERATIONS[min(lvl, len(_MAX_ITERATIONS) - 1)]
            while True:
                H = r["H"].astype(np.float64)
                b = r["b"].astype(np.float64)
                Hsc = r["Hsc"].astype(np.float64)
                bsc = r["bsc"].astype(np.float64)
                H[0, 0] += r["diag_add"]
                H[1, 1] += r["diag_add"]
                H[2, 2] += r["diag_add"]
                H[np.diag_indices(8)] *= 1 + lam
                tlog = SE3(R, t).log()[:3]
                b[0] += tlog[0] * r["diag_add"]
                b[1] += tlog[1] * r["diag_add"]
                b[2] += tlog[2] * r["diag_add"]
                Hl = H - Hsc * (1.0 / (1 + lam))
                bl = b - bsc * (1.0 / (1 + lam))
                inc = np.zeros(8)
                try:
                    if fix_affine:
                        inc[:6] = -np.linalg.solve(Hl[:6, :6], bl[:6])
                    else:
                        inc = -np.linalg.solve(Hl, bl)
                except np.linalg.LinAlgError:
                    break
                if not np.all(np.isfinite(inc)):
                    inc[:] = 0

                T_new = SE3.exp(inc[:6]) * SE3(R, t)
                aff_new = aff + inc[6:8]
                self._do_step(lvl, lam, inc, r)

                r_new = ev(T_new.R, T_new.t, aff_new)
                ec_old, ec_new = self._calc_ec(lvl)
                e_old = r["E_A"] + r["alpha_energy"] + ec_old
                e_new = r_new["E_A"] + r_new["alpha_energy"] + ec_new
                accept = e_old > e_new

                if accept:
                    if r_new["capped"]:
                        self.snapped = True
                    r = r_new
                    R, t, aff = T_new.R, T_new.t, aff_new
                    self._apply_step(lvl, r)
                    self._opt_reg(lvl)
                    lam = max(lam * 0.5, 1e-4)
                    fails = 0
                else:
                    fails += 1
                    lam = min(lam * 4, 1e4)

                if not (np.linalg.norm(inc) > 1e-4) or it >= max_it or fails >= 2:
                    break
                it += 1

        self.this_to_next = SE3(R, t)
        self.this_to_next_aff = aff
        for lvl in range(self.levels - 1):
            self._propagate_up(lvl)

        self.frame_id += 1
        if not self.snapped:
            self.snapped_at = 0
        if self.snapped and self.snapped_at == 0:
            self.snapped_at = self.frame_id
        return self.snapped and self.frame_id > self.snapped_at + 5

    # ------------------------------------------------------------------
    def _do_step(self, lvl, lam, inc, r):
        """Schur back-substitution for idepth (reference doStep :906-938).
        Uses the accepted JbBuffer (d['Jb'])."""
        d = self.pts[lvl]
        n = d["n"]
        Jb = d["Jb"][:n]
        b = Jb[:, 8] + Jb[:, :8] @ inc.astype(np.float32)
        step = -b * Jb[:, 9] / (1 + lam)
        maxstep = np.minimum(0.25 * d["maxstep"][:n], 1e10)
        step = np.clip(step, -maxstep, maxstep)
        newid = np.clip(d["idepth"][:n] + step, 1e-3, 50.0)
        d["idepth_new"][:n] = np.where(d["is_good"][:n], newid, d["idepth_new"][:n])

    def _apply_step(self, lvl, r):
        """Commit the evaluated state (reference applyStep :941-957)."""
        d = self.pts[lvl]
        n = d["n"]
        good = r["is_good_new"][:n]
        d["energy"][:n, 0] = np.where(good, r["energy_new"][:n], d["energy"][:n, 0])
        d["energy"][:n, 1] = np.where(good, r["e_reg_new"][:n], d["energy"][:n, 1])
        d["is_good"][:n] = good
        d["idepth"][:n] = np.where(good, d["idepth_new"][:n], d["iR"][:n])
        d["idepth_new"][:n] = np.where(good, d["idepth_new"][:n], d["iR"][:n])
        d["last_hessian"][:n] = np.where(good, r["last_hessian_new"][:n], d["last_hessian"][:n])
        d["maxstep"][:n] = r["maxstep"][:n]
        d["Jb"][:n] = r["Jb_new"][:n]
