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
