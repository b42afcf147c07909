"""Geometric undistortion.

Rebuild of Undistort (reference: src/util/Undistort.{h,cpp}): the five
camera models (FOV/RadTan/EquiDistant/KannalaBrandt/Pinhole, dispatch at
Undistort.cpp:266-377), the DSO calibration-file format (params /
in-size / "crop"|"full"|K / out-size), automatic crop-K computation
(makeOptimalK_crop :637) and the precomputed bilinear remap (:470+).

The remap table is computed once (numpy); per-frame resampling uses the
table with cv2.remap when available, else a vectorized numpy gather.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _fov_distort(x, y, p):
    w = p[4]
    r = np.sqrt(x * x + y * y)
    fac = np.where(r < 1e-8, 1.0, np.arctan(2.0 * r * np.tan(w / 2)) / (w * np.maximum(r, 1e-8)))
    return x * fac, y * fac


def _radtan_distort(x, y, p):
    k1, k2, p1, p2 = p[4], p[5], p[6], p[7]
    r2 = x * x + y * y
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return xd, yd


def _equi_distort(x, y, p):
    k1, k2, k3, k4 = p[4], p[5], p[6], p[7]
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = np.where(r < 1e-8, 1.0, theta_d / np.maximum(r, 1e-8))
    return x * scale, y * scale


_KB_DISTORT = _equi_distort  # Kannala-Brandt == equidistant polynomial form


def _pinhole_distort(x, y, p):
    return x, y


_MODELS = {
    "FOV": (_fov_distort, 5),
    "RadTan": (_radtan_distort, 8),
    "EquiDistant": (_equi_distort, 8),
    "KannalaBrandt": (_KB_DISTORT, 8),
    "Pinhole": (_pinhole_distort, 5),
}


def _bicubic_interp(g: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized bicubic (Catmull-Rom, a=-0.5) lookup into grid g,
    matching the reference's getInterpolatedElement11BiCub sampling of the
    benchmark noise grids."""
    H, W = g.shape
    x0 = np.clip(np.floor(x).astype(np.int64), 1, W - 3)
    y0 = np.clip(np.floor(y).astype(np.int64), 1, H - 3)
    tx = np.clip(x - x0, 0.0, 1.0)
    ty = np.clip(y - y0, 0.0, 1.0)

    def wts(t):
        t2, t3 = t * t, t * t * t
        return (
            -0.5 * t3 + t2 - 0.5 * t,
            1.5 * t3 - 2.5 * t2 + 1.0,
            -1.5 * t3 + 2.0 * t2 + 0.5 * t,
            0.5 * t3 - 0.5 * t2,
        )

    wx = wts(tx)
    wy = wts(ty)
    out = np.zeros_like(tx, dtype=np.float64)
    for j in range(4):
        row = np.zeros_like(tx, dtype=np.float64)
        for i in range(4):
            row += wx[i] * g[y0 + j - 1, x0 + i - 1]
        out += wy[j] * row
    return out


class Undistorter:
    def __init__(self, model: str, params, in_size, out_size, out_mode,
                 benchmark_fxfyfac: float = 0.0):
        """params: [fx fy cx cy dist...] -- absolute pixels, or relative
        (<=1) which are scaled by the input size like the reference
        (Undistort.cpp readFromFile)."""
        self.model = model
        self.distort_fn = _MODELS[model][0]
        self.w_org, self.h_org = in_size
        self.w, self.h = out_size
        self.benchmark_var_noise = 0.0
        self.benchmark_var_blur_noise = 0.0
        self.benchmark_noise_grid = 3
        self._noise_rng = None
        params = np.array(params, np.float64)
        if params[2] < 1 and params[3] < 1:  # relative calibration
            params[0] *= self.w_org
            params[1] *= self.h_org
            params[2] = params[2] * self.w_org - 0.5
            params[3] = params[3] * self.h_org - 0.5
        self.in_params = params
        self.passthrough = False

        if out_mode == "crop":
            self.K = self._make_optimal_k_crop()
        elif out_mode == "full":
            self.K = self._make_k_full()
        elif out_mode == "none":
            if (self.w, self.h) != (self.w_org, self.h_org):
                raise ValueError("none mode requires identical sizes")
            self.K = np.array(
                [[params[0], 0, params[2]], [0, params[1], params[3]], [0, 0, 1]]
            )
            self.passthrough = self.model == "Pinhole"
        else:  # explicit relative K: [fx fy cx cy]
            fx, fy, cx, cy = out_mode
            self.K = np.array(
                [[fx * self.w, 0, cx * self.w - 0.5],
                 [0, fy * self.h, cy * self.h - 0.5],
                 [0, 0, 1]]
            )
        # benchmark focal-length floor (reference Undistort.cpp:952-957)
        if benchmark_fxfyfac != 0:
            self.K[0, 0] = max(benchmark_fxfyfac, self.K[0, 0])
            self.K[1, 1] = max(benchmark_fxfyfac, self.K[1, 1])
            self.passthrough = False
        self._make_remap()

    # -- parsing -----------------------------------------------------------
    @staticmethod
    def from_file(path: str, benchmark_width: int = 0, benchmark_height: int = 0,
                  benchmark_fxfyfac: float = 0.0) -> "Undistorter":
        """benchmark_* are the resize hooks of the reference
        (settings.cpp:180-182, Undistort.cpp:892-917): override the output
        resolution (switching 'none' to 'crop' when it changes) and floor
        the output focal length."""
        with open(path) as f:
            lines = [ln.strip() for ln in f.readlines() if ln.strip()]
        toks = lines[0].split()
        if toks[0] in _MODELS:
            model = toks[0]
            params = [float(t) for t in toks[1:]]
        else:
            vals = [float(t) for t in toks]
            if len(vals) == 8:
                model = "RadTan"
                params = vals
            elif len(vals) == 5:
                model = "Pinhole" if vals[4] == 0 else "FOV"
                params = vals
            else:
                raise ValueError(f"unrecognized calibration line: {lines[0]}")
        in_w, in_h = (int(x) for x in lines[1].split())
        mode_line = lines[2]
        out_w, out_h = (int(x) for x in lines[3].split())
        if mode_line in ("crop", "full", "none"):
            mode = mode_line
        else:
            mode = [float(x) for x in mode_line.split()][:4]
        if benchmark_width:
            out_w = benchmark_width
            if mode == "none":
                mode = "crop"   # resolution changed (Undistort.cpp:895-898)
        if benchmark_height:
            out_h = benchmark_height
            if mode == "none":
                mode = "crop"
        return Undistorter(model, params, (in_w, in_h), (out_w, out_h), mode,
                           benchmark_fxfyfac=benchmark_fxfyfac)

    # -- K computation -----------------------------------------------------
    def _undistorted_bounds(self, n=100):
        """Normalized coords of undistorted border points."""
        fx, fy, cx, cy = self.in_params[:4]
        xs = np.linspace(0, self.w_org - 1, n)
        ys = np.linspace(0, self.h_org - 1, n)
        border = np.concatenate([
            np.stack([xs, np.zeros(n)], 1),
            np.stack([xs, np.full(n, self.h_org - 1)], 1),
            np.stack([np.zeros(n), ys], 1),
            np.stack([np.full(n, self.w_org - 1), ys], 1),
        ])
        # invert distortion numerically per border pixel
        xn = (border[:, 0] - cx) / fx
        yn = (border[:, 1] - cy) / fy
        u = xn.copy()
        v = yn.copy()
        for _ in range(20):
            xd, yd = self.distort_fn(u, v, self.in_params)
            u += xn - xd
            v += yn - yd
        return u, v

    def _make_optimal_k_crop(self):
        """Largest K whose full output view maps inside the input (the crop
        semantic of makeOptimalK_crop, computed by border analysis)."""
        u, v = self._undistorted_bounds()
        n = len(u) // 4
        # border order: top, bottom, left, right; the interior (crop) box is
        # bounded by the innermost extent of each border curve
        min_x = np.max(u[2 * n : 3 * n])   # left border
        max_x = np.min(u[3 * n :])         # right border
        min_y = np.max(v[:n])              # top border
        max_y = np.min(v[n : 2 * n])       # bottom border
        fx = (self.w - 1) / (max_x - min_x)
        fy = (self.h - 1) / (max_y - min_y)
        cx = -min_x * fx
        cy = -min_y * fy
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])

    def _make_k_full(self):
        u, v = self._undistorted_bounds()
        min_x, max_x = u.min(), u.max()
        min_y, max_y = v.min(), v.max()
        fx = (self.w - 1) / (max_x - min_x)
        fy = (self.h - 1) / (max_y - min_y)
        return np.array([[fx, 0, -min_x * fx], [0, fy, -min_y * fy], [0, 0, 1]])

    # -- remap -------------------------------------------------------------
    def _make_remap(self):
        K = self.K
        fx_in, fy_in, cx_in, cy_in = self.in_params[:4]
        yy, xx = np.meshgrid(np.arange(self.h), np.arange(self.w), indexing="ij")
        xn = (xx - K[0, 2]) / K[0, 0]
        yn = (yy - K[1, 2]) / K[1, 1]
        xd, yd = self.distort_fn(xn, yn, self.in_params)
        rx = fx_in * xd + cx_in
        ry = fy_in * yd + cy_in
        bad = (rx < 0) | (rx > self.w_org - 1) | (ry < 0) | (ry > self.h_org - 1)
        rx = np.where(bad, -1.0, rx).astype(np.float32)
        ry = np.where(bad, -1.0, ry).astype(np.float32)
        self.remap_x = rx
        self.remap_y = ry
        self._bad = bad

    def set_benchmark_noise(self, var_noise: float, grid: int = 3, seed: int = 0,
                            var_blur_noise: float = 0.0):
        """Arm per-frame geometric-noise injection for robustness
        benchmarks (reference Undistort.cpp:452-495): each undistorted
        frame draws a FRESH (grid+8)^2 random shift field, the output
        pixel position is bicubically perturbed by it, and the remap
        table is re-sampled at the shifted position.  var_blur_noise
        additionally arms the spatially-varying separable blur
        (applyBlurNoise, Undistort.cpp:536-633)."""
        self.benchmark_var_noise = float(var_noise)
        self.benchmark_var_blur_noise = float(var_blur_noise)
        self.benchmark_noise_grid = int(grid)
        self._noise_rng = np.random.default_rng(seed)

    def _apply_blur_noise(self, img: np.ndarray) -> np.ndarray:
        """Spatially-varying separable blur with per-position sigma sampled
        bicubically from a random grid (reference applyBlurNoise,
        Undistort.cpp:536-633).  Vectorized over kernel offsets."""
        var = self.benchmark_var_blur_noise
        g = self.benchmark_noise_grid
        h, w = img.shape
        nmx = self._noise_rng.uniform(0.0, var, (g + 8, g + 8))
        nmy = self._noise_rng.uniform(0.0, var, (g + 8, g + 8))
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64), indexing="ij")
        sx = 4.0 + (xx / w) * g
        sy = 4.0 + (yy / h) * g
        sig_x = np.maximum(_bicubic_interp(nmx, sx, sy), 0.01)
        sig_y = np.maximum(_bicubic_interp(nmy, sx, sy), 0.01)

        def blur_axis(src, sig, kmax, axis):
            sumw = np.zeros_like(src)
            sumcw = np.zeros_like(src)
            for d in range(kmax + 1):
                gw = np.exp(-np.minimum(d / sig, 9.0) ** 2)
                for sgn in ((1,) if d == 0 else (1, -1)):
                    sh = np.roll(src, -sgn * d, axis=axis)
                    valid = np.ones_like(src, dtype=bool)
                    idx = (yy if axis == 0 else xx) + sgn * d
                    lim = h if axis == 0 else w
                    valid &= (idx > 0) & (idx < lim)
                    sumw += np.where(valid, gw, 0.0)
                    sumcw += np.where(valid, gw * sh, 0.0)
            return sumcw / np.maximum(sumw, 1e-12)

        kx = 1 + int(1.0 + var * 1.5)
        ky = 1 + int(0.9 + var * 2.5)
        tmp = blur_axis(img.astype(np.float64), sig_x, kx, axis=1)
        out = blur_axis(tmp, sig_y, ky, axis=0)
        return out.astype(np.float32)

    def _noisy_remap(self):
        """One frame's perturbed remap tables (fresh noise each call)."""
        g = self.benchmark_noise_grid
        var = self.benchmark_var_noise
        nmx = self._noise_rng.uniform(-var, var, (g + 8, g + 8))
        nmy = self._noise_rng.uniform(-var, var, (g + 8, g + 8))
        # noise sampled at the undistorted source position (xx/wOrg scaled
        # into grid coords, +4 border -- Undistort.cpp:480-481)
        sx = 4.0 + (self.remap_x / self.w_org) * g
        sy = 4.0 + (self.remap_y / self.h_org) * g
        dx = _bicubic_interp(nmx, sx, sy)
        dy = _bicubic_interp(nmy, sx, sy)
        yy, xx = np.meshgrid(np.arange(self.h, dtype=np.float64),
                             np.arange(self.w, dtype=np.float64), indexing="ij")
        x = np.clip(xx + dx, 0.01, self.w - 1.01)
        y = np.clip(yy + dy, 0.01, self.h - 1.01)
        # bilinear re-lookup of the remap table at the shifted output
        # position (Undistort.cpp:492-493)
        x0 = x.astype(np.int64)
        y0 = y.astype(np.int64)
        fx = (x - x0).astype(np.float32)
        fy = (y - y0).astype(np.float32)

        def bl(t):
            return (t[y0, x0] * (1 - fx) * (1 - fy) + t[y0, x0 + 1] * fx * (1 - fy)
                    + t[y0 + 1, x0] * (1 - fx) * fy + t[y0 + 1, x0 + 1] * fx * fy)

        return bl(self.remap_x).astype(np.float32), bl(self.remap_y).astype(np.float32)

    def undistort_image(self, img: np.ndarray) -> np.ndarray:
        """Bilinear resample through the remap table; invalid pixels -> 0."""
        if self.passthrough:
            # the reference's passthrough path skips noise too (:523-526)
            return img.astype(np.float32)
        if self.benchmark_var_noise > 0:
            rx, ry = self._noisy_remap()
            bad = (rx < 0) | (ry < 0)
        else:
            rx, ry, bad = self.remap_x, self.remap_y, self._bad
        if cv2 is not None:
            out = cv2.remap(
                img.astype(np.float32), rx, ry,
                interpolation=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=0,
            )
        else:
            x0 = np.clip(rx.astype(int), 0, self.w_org - 2)
            y0 = np.clip(ry.astype(int), 0, self.h_org - 2)
            dx = np.clip(rx - x0, 0, 1)
            dy = np.clip(ry - y0, 0, 1)
            out = (
                img[y0, x0] * (1 - dx) * (1 - dy)
                + img[y0, x0 + 1] * dx * (1 - dy)
                + img[y0 + 1, x0] * (1 - dx) * dy
                + img[y0 + 1, x0 + 1] * dx * dy
            ).astype(np.float32)
        out[bad] = 0
        if getattr(self, "benchmark_var_blur_noise", 0.0) > 0:
            out = self._apply_blur_noise(out)
        return out

    def resize_nearest(self, img: np.ndarray) -> np.ndarray:
        """INTER_NEAREST resize for discrete mask labels and color
        (reference ImageRW_OpenCV.cpp:55-85 / undistort_mask :385-432)."""
        hs = (np.arange(self.h) * img.shape[0] / self.h).astype(int)
        ws = (np.arange(self.w) * img.shape[1] / self.w).astype(int)
        return img[hs][:, ws]
