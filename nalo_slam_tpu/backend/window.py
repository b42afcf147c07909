"""Sliding-window state containers (host side).

FrameState ~ FrameHessian's variable part (reference
src/FullSystem/HessianBlocks.h:118-315): evaluation-point pose (FEJ),
10-dof state delta [trans(3), rot(3), a, b, a', b'] in REAL units, priors,
energy threshold.  PointArrays ~ the set of PointHessians, but as padded
slot arrays of size P so every device kernel sees constant shapes; slot
lifecycle is a free-list on the host.

Residual slots are the dense (P, F) grid described in ba_kernels.py.
"""

from __future__ import annotations

import numpy as np

from ..config import (SCALE_A, SCALE_B, SCALE_C, SCALE_F, SCALE_XI_ROT,
                      SCALE_XI_TRANS, SOLVER_REMOVE_POSEPRIOR)
from ..geometry import SE3

RES_IN = 0
RES_OOB = 1
RES_OUTLIER = 2
RES_NONE = 3  # slot unused

# real-unit prior conversion (reference priors are in SCALE_* coordinates)
_S2_TRANS = SCALE_XI_TRANS**2
_S2_ROT = SCALE_XI_ROT**2
_S2_A = SCALE_A**2
_S2_B = SCALE_B**2
_S2_C = SCALE_C**2
_S2_F = SCALE_F**2


class FrameState:
    """One keyframe in the window."""

    def __init__(self, frame_id: int, shell, ab_exposure: float, settings):
        self.frame_id = frame_id          # keyframe id (allKeyFramesHistory idx)
        self.shell = shell                # host frame record (pose, timestamps)
        self.ab_exposure = ab_exposure
        self.s = settings
        self.worldToCam_evalPT = SE3()
        self.state = np.zeros(10)
        self.state_zero = np.zeros(10)
        self.state_backup = np.zeros(10)
        self.step = np.zeros(10)
        self.frame_energy_th = 8.0 * 8.0 * 8  # 8*8*patternNum
        self.flagged_for_marg = False
        # lifetime counters of points hosted by this frame that left the
        # active set (reference pointHessiansMarginalized/-Out sizes, used by
        # the marginalization point-fraction rule FullSystemMarginalize.cpp:74-84)
        self.n_pts_marginalized = 0
        self.n_pts_out = 0
        self.nullspaces_pose = np.zeros((6, 6))
        self.nullspaces_scale = np.zeros(6)
        self.nullspaces_affine = np.zeros((4, 2))
        self._pre_cache = None

    # -- state access (reference HessianBlocks.h:188-242, real units) ------
    # PRE_* are pure functions of (state, worldToCam_evalPT), both of which
    # change only through set_state/set_eval_pt -- cached because the
    # orchestrator reads them ~50x per frame (measured 0.8 s / 40 frames
    # recomputing the exp+inverse on every access)
    @property
    def PRE_worldToCam(self) -> SE3:
        c = self._pre_cache
        if c is None:
            w2c = SE3.exp(self.state[:6]) * self.worldToCam_evalPT
            self._pre_cache = c = (w2c, w2c.inverse())
        return c[0]

    @property
    def PRE_camToWorld(self) -> SE3:
        c = self._pre_cache
        if c is None:
            w2c = SE3.exp(self.state[:6]) * self.worldToCam_evalPT
            self._pre_cache = c = (w2c, w2c.inverse())
        return c[1]

    def aff_g2l(self):
        return self.state[6], self.state[7]

    def aff_g2l_0(self):
        return self.state_zero[6], self.state_zero[7]

    def delta(self):
        return (self.state - self.state_zero)[:8]

    def delta_prior(self):
        return self.state[:8]  # prior zero point is 0 (getPriorZero)

    def set_state(self, state):
        self.state = np.asarray(state, np.float64).copy()
        self._pre_cache = None

    def set_eval_pt(self, worldToCam: SE3, state):
        self.worldToCam_evalPT = worldToCam.copy()
        self._pre_cache = None
        self.set_state(state)
        self.set_state_zero(np.asarray(state, np.float64).copy())

    def set_eval_pt_scaled(self, worldToCam: SE3, a: float, b: float):
        st = np.zeros(10)
        st[6], st[7] = a, b
        self.set_eval_pt(worldToCam, st)

    def set_state_zero(self, state_zero):
        assert np.all(np.abs(state_zero[:6]) < 1e-9)
        self.state_zero = np.asarray(state_zero, np.float64).copy()
        # nullspaces (reference HessianBlocks.cpp:73-106): numeric derivation
        T = self.worldToCam_evalPT
        eps = 1e-3
        for i in range(6):
            e = np.zeros(6)
            e[i] = eps
            p = (T * SE3.exp(e) * T.inverse()).log()
            m = (T * SE3.exp(-e) * T.inverse()).log()
            self.nullspaces_pose[:, i] = (p - m) / (2 * eps)
        Tp = SE3(T.R, T.t * 1.00001)
        Tm = SE3(T.R, T.t / 1.00001)
        self.nullspaces_scale = ((Tp * T.inverse()).log() - (Tm * T.inverse()).log()) / 2e-3
        self.nullspaces_affine[:] = 0
        self.nullspaces_affine[0, 0] = 1.0
        self.nullspaces_affine[1, 1] = np.exp(self.aff_g2l_0()[0]) * self.ab_exposure

    def prior(self) -> np.ndarray:
        """8-vector prior Hessian, REAL units (reference getPrior :271-300)."""
        s = self.s
        p = np.zeros(8)
        if self.frame_id == 0:
            p[0:3] = s.initial_trans_prior / _S2_TRANS
            p[3:6] = s.initial_rot_prior / _S2_ROT
            if s.solver_mode & SOLVER_REMOVE_POSEPRIOR:
                p[0:6] = 0
            p[6] = s.initial_aff_a_prior / _S2_A
            p[7] = s.initial_aff_b_prior / _S2_B
        else:
            p[6] = (s.initial_aff_a_prior if s.affine_opt_mode_a < 0 else s.affine_opt_mode_a) / _S2_A
            p[7] = (s.initial_aff_b_prior if s.affine_opt_mode_b < 0 else s.affine_opt_mode_b) / _S2_B
        return p


class PointArrays:
    """Padded point slots + (P, F) residual slots."""

    def __init__(self, P: int, F: int, settings):
        self.P, self.F = P, F
        self.s = settings
        self.active = np.zeros(P, bool)
        self.host = np.zeros(P, np.int32)
        self.u = np.zeros(P, np.float32)
        self.v = np.zeros(P, np.float32)
        self.color = np.zeros((P, 8), np.float32)
        self.weights = np.zeros((P, 8), np.float32)
        self.idepth = np.zeros(P, np.float32)
        self.idepth_zero = np.zeros(P, np.float32)
        self.idepth_backup = np.zeros(P, np.float32)
        self.step = np.zeros(P, np.float32)
        self.energy_th = np.zeros(P, np.float32)
        self.prior = np.zeros(P, np.float32)         # priorF
        self.has_depth_prior = np.zeros(P, bool)
        self.num_good_res = np.zeros(P, np.int32)
        self.max_rel_baseline = np.zeros(P, np.float32)
        self.idepth_hessian = np.zeros(P, np.float32)
        self.my_type = np.ones(P, np.float32)
        self.status = np.zeros(P, np.int8)           # 0 active, 1 marg, 2 drop

        # lastResiduals[2] (reference HessianBlocks.h:476): the residual
        # state towards the newest ([:,0]) and second-newest ([:,1]) KF at
        # their last linearization, kept across residual drops
        self.last_res_state = np.full((P, 2), RES_NONE, np.int8)

        # residual slots
        self.r_exists = np.zeros((P, F), bool)
        self.r_state = np.full((P, F), RES_NONE, np.int8)
        self.r_active = np.zeros((P, F), bool)       # isActiveAndIsGoodNEW
        self.r_linearized = np.zeros((P, F), bool)
        self.r_energy = np.zeros((P, F), np.float32)
        self.r_is_new = np.zeros((P, F), bool)

    def free_slots(self, n: int) -> np.ndarray:
        free = np.nonzero(~self.active)[0]
        return free[:n]

    def n_active(self) -> int:
        return int(self.active.sum())

    def remove(self, idx):
        """Free point slots and their residuals."""
        self.active[idx] = False
        self.r_exists[idx] = False
        self.r_state[idx] = RES_NONE
        self.r_active[idx] = False
        self.r_linearized[idx] = False

    def shift_frame_down(self, k: int, n_frames: int):
        """Remove frame k from residual columns: frames k+1..n-1 -> k..n-2.
        Host indices decremented (points hosted in k must be gone)."""
        F = self.F
        assert not np.any(self.active & (self.host == k))
        cols = list(range(F))
        new_order = cols[:k] + cols[k + 1 :] + [k]
        for name in ("r_exists", "r_state", "r_active", "r_linearized",
                     "r_energy", "r_is_new"):
            a = getattr(self, name)
            setattr(self, name, np.ascontiguousarray(a[:, new_order]))
        # the recycled last column is now unused
        self.r_exists[:, n_frames - 1 :] = False
        self.r_state[:, n_frames - 1 :] = RES_NONE
        self.r_active[:, n_frames - 1 :] = False
        self.r_linearized[:, n_frames - 1 :] = False
        self.host = np.where(self.host > k, self.host - 1, self.host)
        return new_order
