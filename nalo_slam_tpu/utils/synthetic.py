"""Analytic synthetic scenes for golden-value tests and benchmarks.

A textured plane (constant world Z) with a continuous analytic texture is
rendered exactly for any camera pose: no resampling error, exact ground-truth
pose and inverse depth.  This replaces the reference's approach of validating
only on recorded datasets (it has no tests; SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from ..geometry import SE3, PyramidCalib


def texture(X, Y):
    """Smooth, high-gradient-content analytic texture in [~20, ~235]."""
    return (
        128.0
        + 35.0 * np.sin(1.7 * X) * np.cos(2.3 * Y)
        + 25.0 * np.sin(5.1 * X + 1.0)
        + 20.0 * np.cos(4.3 * Y + 0.5)
        + 15.0 * np.sin(9.7 * X + 3.1 * Y)
        + 10.0 * np.cos(13.3 * X - 7.9 * Y + 1.3)
    )


class PlaneScene:
    """Textured plane at world Z = z0, cameras looking down +z."""

    def __init__(self, calib: PyramidCalib, z0: float = 3.0):
        self.calib = calib
        self.z0 = z0

    def render(self, cam_to_world: SE3, exposure: float = 1.0, aff=(0.0, 0.0)):
        """Returns (image (H,W) f32, idepth (H,W) f32) for the given pose.

        aff = (a, b): image = exp(a) * radiance + b, mimicking the
        AffLight model (reference NumType.h:165-191).
        """
        c = self.calib
        w, h = c.w[0], c.h[0]
        u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
        # ray in cam frame
        d = np.stack(
            [(u - c.cx[0]) / c.fx[0], (v - c.cy[0]) / c.fy[0], np.ones_like(u)], axis=-1
        )
        R, t = cam_to_world.R, cam_to_world.t
        dw = d @ R.T  # world-frame ray dirs
        s = (self.z0 - t[2]) / dw[..., 2]
        X = t[0] + s * dw[..., 0]
        Y = t[1] + s * dw[..., 1]
        img = texture(X, Y)
        img = np.exp(aff[0]) * img + aff[1]
        # inverse depth along camera z: p_cam.z = s * d.z(cam) with d.z=1 -> z = s
        idepth = 1.0 / s
        return img.astype(np.float32), idepth.astype(np.float32)


def default_calib(w=320, h=240, f=250.0) -> PyramidCalib:
    return PyramidCalib.make(w, h, f, f, (w - 1) / 2.0, (h - 1) / 2.0)


class GroundWallScene:
    """Ground plane (world y = +y0, camera +y down) plus a back wall at
    world z = z_wall; an MP-mask-style label image marks ground pixels 230
    and wall pixels 100 (the reference's mask is a LiDAR-geometry prior
    image where high values mean strong planar geometry)."""

    def __init__(self, calib: PyramidCalib, y0: float = 1.5, z_wall: float = 8.0):
        self.calib = calib
        self.y0 = y0
        self.z_wall = z_wall

    def render(self, cam_to_world: SE3):
        c = self.calib
        w, h = c.w[0], c.h[0]
        u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
        d = np.stack(
            [(u - c.cx[0]) / c.fx[0], (v - c.cy[0]) / c.fy[0], np.ones_like(u)], axis=-1
        )
        R, t = cam_to_world.R, cam_to_world.t
        dw = d @ R.T
        # ground: y = y0 ; wall: z = z_wall
        s_g = np.where(dw[..., 1] > 1e-6, (self.y0 - t[1]) / dw[..., 1], np.inf)
        s_w = np.where(dw[..., 2] > 1e-6, (self.z_wall - t[2]) / dw[..., 2], np.inf)
        ground_hit = (s_g > 0.1) & (s_g < s_w)
        s = np.where(ground_hit, s_g, s_w)
        X = t[0] + s * dw[..., 0]
        Y = t[1] + s * dw[..., 1]
        Z = t[2] + s * dw[..., 2]
        img = np.where(ground_hit, texture(X, Z), texture(X, Y) * 0.9 + 10)
        idepth = 1.0 / s
        mask = np.where(ground_hit, 230.0, 100.0).astype(np.float32)
        return img.astype(np.float32), idepth.astype(np.float32), mask


class MultiPlaneScene:
    """Ground + back wall + two side walls, each with a distinct MP-mask
    label.  Four-surface analytic corridor: enough mask clusters to pass
    the dense frontend's >=4-cluster gate (reference makeMaskDistMap
    duplicate-value clustering, CoarseTracker.cpp:185-290), with the
    ground labeled >=200 so it is ground-score-eligible
    (fitPlane :362-374).  The 2-label GroundWallScene keeps the
    plane/rescale machinery inert in both binaries (see PARITY.md
    round-5 notes); this scene exists to exercise it end-to-end.

    Labels: ground 230, back wall 100, left wall 120, right wall 140."""

    def __init__(self, calib: PyramidCalib, y0: float = 1.5,
                 z_wall: float = 30.0, x_wall: float = 6.0):
        self.calib = calib
        self.y0 = y0
        self.z_wall = z_wall
        self.x_wall = x_wall

    def render(self, cam_to_world: SE3):
        c = self.calib
        w, h = c.w[0], c.h[0]
        u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                           np.arange(h, dtype=np.float64))
        d = np.stack([(u - c.cx[0]) / c.fx[0], (v - c.cy[0]) / c.fy[0],
                      np.ones_like(u)], axis=-1)
        R, t = cam_to_world.R, cam_to_world.t
        dw = d @ R.T

        def hit(num, comp):
            return np.where(np.abs(dw[..., comp]) > 1e-9,
                            num / dw[..., comp], np.inf)

        cands = [
            # (distance along ray, label, texture plane axes)
            (hit(self.y0 - t[1], 1), 230.0, "ground"),
            (hit(self.z_wall - t[2], 2), 100.0, "back"),
            (hit(-self.x_wall - t[0], 0), 120.0, "left"),
            (hit(self.x_wall - t[0], 0), 140.0, "right"),
        ]
        s = np.full((h, w), np.inf)
        lab = np.zeros((h, w))
        kind = np.zeros((h, w), dtype=int)
        for i, (si, li, _) in enumerate(cands):
            si = np.where(si > 0.1, si, np.inf)
            better = si < s
            s = np.where(better, si, s)
            lab = np.where(better, li, lab)
            kind = np.where(better, i, kind)
        s = np.where(np.isfinite(s), s, 1e6)
        X = t[0] + s * dw[..., 0]
        Y = t[1] + s * dw[..., 1]
        Z = t[2] + s * dw[..., 2]
        img = np.select(
            [kind == 0, kind == 1, kind == 2, kind == 3],
            [texture(X, Z), texture(X, Y) * 0.9 + 10,
             texture(Z, Y) * 0.85 + 18, texture(Z, Y) * 0.95 + 4],
        )
        idepth = (1.0 / s).astype(np.float32)
        return (img.astype(np.float32), idepth,
                lab.astype(np.float32))
