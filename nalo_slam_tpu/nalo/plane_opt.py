"""Ground-plane scale constraint: global plane lock + keyframe rescaling.

Rebuild of FullSystem::setglobalplane / setinitgroundheight /
resetGlobalPlane (reference src/FullSystem/FullSystem.cpp:1877-2001) and
planeOptimize (src/FullSystem/PlaneOptimize.cpp:183-301).

The reference's follow-up Ceres photometric re-optimization
(SWGrayOptimize_J, PlaneOptimize.cpp:307-454) minimizes the SAME
photometric residual as the sliding-window BA over poses + idepths
(its GrayTHFactor_TH factor is the window residual with a Huber(100) loss,
PlaneOptimize.h:299-460); here the rescaled window simply re-enters the
device GN loop (WindowOptimizer.optimize_device) -- one engine, reused.
"""

from __future__ import annotations

import numpy as np

from ..geometry import SE3


class GlobalPlane:
    def __init__(self):
        self.fixed = False
        self.gplane = np.zeros(4)
        self.backup = np.zeros(4)
        self.lgh = 0.0  # local ground height

    # ------------------------------------------------------------------
    def set_global_plane(self, frames, ground_planes, max_frames: int) -> bool:
        """Lock the world plane when per-KF planes agree across the window
        (reference setglobalplane :1911-1976).  frames: FrameState list;
        ground_planes: (F, 4) per-frame camera-space planes."""
        if len(frames) < max_frames:
            return False
        win = len(frames)
        last_pi = ground_planes[win - 2].astype(np.float64)
        sumnorm = 0.0
        for i in range(win - 2, 0, -1):
            pi = last_pi
            last_pi = ground_planes[i - 1].astype(np.float64)
            if (pi[3] == 0 or not np.all(np.isfinite(pi)) or abs(pi[1]) > 1):
                return False
            sumnorm += np.linalg.norm(pi - last_pi)
        if sumnorm >= 0.2:
            return False
        pih = ground_planes[1].astype(np.float64)
        # plane transform: pi_w = T_wc^{-T} pi_c = (worldToCam)^T pi_c
        T = frames[1].PRE_worldToCam.matrix()
        piw = T.T @ pih
        self.gplane = piw
        self.backup = piw.copy()
        self.lgh = float(pih[3])
        self.fixed = True
        return True

    def set_init_ground_height(self, frames, ground_planes, have_ground) -> bool:
        """Average-height fallback lock (reference :1877-1908)."""
        if len(frames) <= 3:
            return False
        heights = [ground_planes[0][3] for i, f in enumerate(frames)
                   if have_ground[i] and ground_planes[0][3] != 0]
        if len(heights) < 2:
            return False
        self.lgh = float(np.mean(heights))
        self.fixed = True
        return True

    def reset(self, frames, ground_planes, have_ground):
        """Re-anchor the world plane from the newest KF with a plane
        (reference resetGlobalPlane :1979-2001)."""
        for i in range(len(frames) - 2, -1, -1):
            if have_ground[i]:
                T = frames[i].PRE_worldToCam.matrix()
                self.gplane = T.T @ ground_planes[i].astype(np.float64)
                return


def plane_optimize(window, lgh: float, newest_plane: np.ndarray) -> float:
    """Rescale the newest keyframe so its ground height matches the locked
    height, reset its linearization point, and refresh adjoints
    (reference planeOptimize :183-301).  Returns the applied scale."""
    if newest_plane[3] == 0:
        return 1.0
    localscale = lgh / float(newest_plane[3])
    if not np.isfinite(localscale) or localscale <= 0:
        return 1.0
    fs = window.frames[-1]
    shell = fs.shell
    if shell is None or shell.trackingRef is None:
        return 1.0
    cam2ref = SE3(shell.camToTrackingRef.R, shell.camToTrackingRef.t * localscale)
    new_c2w = shell.trackingRef.camToWorld * cam2ref
    # idepths of points hosted in the newest frame scale inversely
    p = window.pts
    idx = window.n_frames - 1
    m = p.active & (p.host == idx)
    p.idepth = np.where(m, p.idepth / localscale, p.idepth).astype(np.float32)
    p.idepth_zero = np.where(m, p.idepth_zero / localscale, p.idepth_zero).astype(np.float32)
    # new linearization point at the rescaled pose
    new_zero = np.zeros(10)
    new_zero[6:8] = fs.state[6:8]
    fs.set_eval_pt(new_c2w.inverse(), new_zero)
    shell.camToWorld = new_c2w
    shell.camToTrackingRef = cam2ref
    window.set_adjoints()
    return localscale


def sw_gray_optimize(window, iters: int = 3) -> float:
    """Photometric re-optimization after the rescale -- the reference's
    SWGrayOptimize_J expressed through the existing window GN engine."""
    return window.optimize_device(iters)
