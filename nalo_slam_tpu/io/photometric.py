"""Photometric calibration: inverse response (gamma) + vignette.

Rebuild of PhotometricUndistorter (reference: src/util/Undistort.cpp:47-254)
and the gamma LUTs the backend consumes (CalibHessian B/Binv,
src/FullSystem/HessianBlocks.h:345-416; copied from the undistorter at
FullSystem.cpp:240-265):

* pcalib.txt: one line of GDepth (>=256) strictly increasing response
  samples, normalized to [0, 255];
* vignette: 16-bit or 8-bit PNG, normalized by its max, inverse applied;
* processFrame: I_corrected = G^-1[I_raw] * vignette^-1 (:214-254).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class GammaCalib:
    """B (response) and B-gradient LUTs for the pixel selector and the
    tracker's gamma reweighting."""

    def __init__(self, G: np.ndarray | None = None):
        if G is None:
            G = np.linspace(0, 255, 256, dtype=np.float32)
        self.G = G.astype(np.float32)
        # B' lookup on a 256-entry grid (getBGradOnly)
        g = np.interp(np.arange(256), np.linspace(0, 255, len(G)), G)
        self.B = g.astype(np.float32)
        grad = np.zeros(256, np.float32)
        grad[1:-1] = 0.5 * (self.B[2:] - self.B[:-2])
        grad[0] = self.B[1] - self.B[0]
        grad[-1] = self.B[-1] - self.B[-2]
        self.B_grad = grad


class PhotometricUndistorter:
    def __init__(self, gamma_file: str | None, vignette_file: str | None,
                 w: int, h: int, photometric_mode: int = 2):
        self.w, self.h = w, h
        self.valid = False
        self.G_depth = 256
        G = np.linspace(0, 255, 256)
        if gamma_file:
            with open(gamma_file) as f:
                vals = np.array([float(t) for t in f.readline().split()])
            if len(vals) < 256:
                raise ValueError("pcalib needs >= 256 entries")
            if not np.all(np.diff(vals) > 0):
                raise ValueError("gamma response must be strictly increasing")
            G = 255.0 * (vals - vals[0]) / (vals[-1] - vals[0])
            self.G_depth = len(G)
            self.valid = True
        if photometric_mode == 0:
            G = np.linspace(0, 255, self.G_depth)
        self.G = G.astype(np.float32)
        self.gamma = GammaCalib(self.G)

        self.vignette_inv = np.ones((h, w), np.float32)
        if vignette_file and photometric_mode >= 2:
            if cv2 is None:
                raise RuntimeError("cv2 required to read vignette images")
            vm = cv2.imread(vignette_file, cv2.IMREAD_UNCHANGED)
            if vm is None:
                raise FileNotFoundError(vignette_file)
            if vm.ndim == 3:
                vm = vm[..., 0]
            if vm.shape != (h, w):
                raise ValueError(f"vignette size {vm.shape} != {(h, w)}")
            vmf = vm.astype(np.float32) / vm.max()
            self.vignette_inv = 1.0 / np.maximum(vmf, 1e-3)
        else:
            self.valid = self.valid and photometric_mode < 2

    def process(self, img_raw: np.ndarray, exposure: float = 1.0):
        """Returns (irradiance image f32, exposure).  8-bit input applies the
        inverse response LUT; 16-bit scales into the LUT domain
        (processFrame :214-254)."""
        if img_raw.dtype == np.uint16:
            idx = np.clip(
                (img_raw.astype(np.float32) * (self.G_depth - 1) / 65535.0).astype(int),
                0, self.G_depth - 1,
            )
        else:
            idx = np.clip(img_raw.astype(int), 0, min(self.G_depth - 1, 255))
        out = self.G[idx] * self.vignette_inv
        return out.astype(np.float32), exposure
