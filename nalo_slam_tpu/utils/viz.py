"""Offline visualization: depth/residual image rendering.

Rebuild of the reference's debug imagery (FullSystemDebugStuff.cpp
debugPlot/debugPlotTracking, CoarseTracker::debugPlotIDepthMap
:1263-1370) without a GUI: images are rendered to arrays/PNGs so runs can
be inspected offline (the Pangolin viewer itself is out of the parity
scope, SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np


def _jet(x: np.ndarray) -> np.ndarray:
    """Simple jet-style colormap for values in [0, 1] -> (..., 3) uint8
    (the reference uses makeJet3B, globalFuncs.h)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def render_idepth_map(idepth: np.ndarray, valid: np.ndarray | None = None,
                      background: np.ndarray | None = None) -> np.ndarray:
    """Inverse-depth visualization: jet-colored over the (optional) gray
    image, invalid pixels untouched."""
    if valid is None:
        valid = idepth > 0
    lo, hi = (np.percentile(idepth[valid], [5, 95]) if valid.any() else (0, 1))
    norm = (idepth - lo) / max(hi - lo, 1e-9)
    color = _jet(norm)
    if background is not None:
        bg = np.clip(background, 0, 255).astype(np.uint8)
        out = np.repeat(bg[..., None], 3, -1)
    else:
        out = np.zeros(idepth.shape + (3,), np.uint8)
    out[valid] = color[valid]
    return out


def render_residual_map(residual: np.ndarray, valid: np.ndarray,
                        scale: float = 128.0) -> np.ndarray:
    """Residual image like CoarseTracker's debug pane: gray 128 +- r."""
    img = np.full(residual.shape, 255, np.uint8)
    vals = np.clip(residual[valid] + scale, 0, 255).astype(np.uint8)
    img[valid] = vals
    return img


def save_png(path: str, img: np.ndarray):
    try:
        import cv2

        cv2.imwrite(path, img[..., ::-1] if img.ndim == 3 else img)
    except ImportError:  # pragma: no cover
        from PIL import Image

        Image.fromarray(img).save(path)


def render_trajectory_topdown(xyz: np.ndarray, size: int = 512) -> np.ndarray:
    """Top-down (x, z) trajectory plot as an image."""
    img = np.full((size, size, 3), 255, np.uint8)
    if len(xyz) < 2:
        return img
    x, z = xyz[:, 0], xyz[:, 2]
    lo = np.array([x.min(), z.min()])
    hi = np.array([x.max(), z.max()])
    span = max((hi - lo).max(), 1e-6)
    px = ((x - lo[0]) / span * (size - 20) + 10).astype(int)
    pz = (size - 10 - (z - lo[1]) / span * (size - 20)).astype(int)
    for i in range(1, len(px)):
        n = max(abs(px[i] - px[i - 1]), abs(pz[i] - pz[i - 1]), 1)
        for tt in np.linspace(0, 1, n + 1):
            xx = int(px[i - 1] + tt * (px[i] - px[i - 1]))
            zz = int(pz[i - 1] + tt * (pz[i] - pz[i - 1]))
            img[np.clip(zz, 0, size - 1), np.clip(xx, 0, size - 1)] = (200, 30, 30)
    return img
