"""Dataset ingestion: image folders / zips, timestamps, masks, color.

Rebuild of ImageFolderReader (reference: src/util/DatasetReader.h):
* folder or zip image streams (:130-159; zipfile replaces libzip),
* optional mask= and colors= folders with INTER_NEAREST resizing so the
  discrete MP-mask labels survive (:161-165, ImageRW_OpenCV.cpp:55-85),
* times.txt with "id time [exposure]" rows and the exposure repair pass
  (:317-380),
* getImage -> dict(image f32 HxW, mask, bgr, exposure, timestamp)
  after photometric + geometric undistortion (:296-315).
"""

from __future__ import annotations

import os
import zipfile

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .photometric import PhotometricUndistorter
from .undistort import Undistorter

_IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".pgm", ".tif")


def _list_images(path: str):
    if path.endswith(".zip"):
        zf = zipfile.ZipFile(path)
        names = sorted(n for n in zf.namelist() if n.lower().endswith(_IMG_EXT))
        return zf, names
    names = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.lower().endswith(_IMG_EXT)
    )
    return None, names


def _read_gray(zf, name, flags=None):
    if cv2 is None:
        raise RuntimeError("cv2 required for dataset reading")
    if zf is not None:
        buf = np.frombuffer(zf.read(name), np.uint8)
        return cv2.imdecode(buf, cv2.IMREAD_UNCHANGED if flags is None else flags)
    return cv2.imread(name, cv2.IMREAD_UNCHANGED if flags is None else flags)


class ImageFolderReader:
    def __init__(self, images_path: str, calib_file: str,
                 gamma_file: str | None = None, vignette_file: str | None = None,
                 masks_path: str | None = None, colors_path: str | None = None,
                 photometric_mode: int = 2, settings=None):
        self.zf, self.files = _list_images(images_path)
        if not self.files:
            raise FileNotFoundError(f"no images under {images_path}")
        # benchmark hooks from Settings (resize: settings.cpp:180-182;
        # per-frame geometric noise: Undistort.cpp:452-495)
        bw = bh = 0
        bfac = bnoise = bblur = 0.0
        bgrid = 3
        if settings is not None:
            bw = settings.benchmark_width
            bh = settings.benchmark_height
            bfac = settings.benchmark_fxfyfac
            bnoise = settings.benchmark_var_noise
            bblur = settings.benchmark_var_blur_noise
            bgrid = settings.benchmark_noise_grid_size
        self.undistorter = Undistorter.from_file(
            calib_file, benchmark_width=bw, benchmark_height=bh,
            benchmark_fxfyfac=bfac,
        )
        if bnoise > 0 or bblur > 0:
            self.undistorter.set_benchmark_noise(
                bnoise, bgrid, seed=settings.seed if settings else 0,
                var_blur_noise=bblur)
        self.photo = PhotometricUndistorter(
            gamma_file, vignette_file,
            self.undistorter.w_org, self.undistorter.h_org, photometric_mode,
        )
        self.mask_files = None
        self.color_files = None
        if masks_path:
            _, self.mask_files = _list_images(masks_path)
        if colors_path:
            _, self.color_files = _list_images(colors_path)

        # fused native preprocessing (gamma+vignette+remap in one pass,
        # multithreaded; nalo_slam_tpu/native)
        self.native = None
        try:
            from ..native import FramePipeline, native_available
            # the native pipeline bakes the remap table, so it cannot serve
            # the per-frame benchmark noise path
            if (native_available() and not self.undistorter.passthrough
                    and bnoise <= 0):
                vig = self.photo.vignette_inv
                vig = None if np.all(vig == 1.0) else vig
                g = np.interp(np.arange(256),
                              np.linspace(0, 255, len(self.photo.G)), self.photo.G)
                self.native = FramePipeline(
                    self.undistorter.remap_x, self.undistorter.remap_y,
                    g.astype(np.float32), vig,
                    (self.undistorter.h_org, self.undistorter.w_org),
                )
        except Exception:
            self.native = None

        self.timestamps = None
        self.exposures = None
        times = os.path.join(os.path.dirname(images_path.rstrip("/")), "times.txt")
        if os.path.exists(times):
            self._load_times(times)

    def _load_times(self, path: str):
        """times.txt rows: id stamp [exposure]; repair zero exposures by
        neighbor interpolation (reference :340-377)."""
        ts, exps = [], []
        with open(path) as f:
            for line in f:
                toks = line.split()
                if len(toks) >= 3:
                    ts.append(float(toks[1]))
                    exps.append(float(toks[2]))
                elif len(toks) == 2:
                    ts.append(float(toks[1]))
                    exps.append(0.0)
                elif len(toks) == 1:
                    ts.append(float(toks[0]))
                    exps.append(0.0)
        n = min(len(ts), len(self.files))
        ts, exps = np.array(ts[:n]), np.array(exps[:n])
        # exposure repair
        for i in range(len(exps)):
            if exps[i] == 0:
                prev = exps[i - 1] if i > 0 else 0
                nxt = exps[i + 1] if i + 1 < len(exps) else 0
                if prev > 0 and nxt > 0:
                    exps[i] = 0.5 * (prev + nxt)
                elif prev > 0:
                    exps[i] = prev
                elif nxt > 0:
                    exps[i] = nxt
        if np.all(exps > 0):
            self.exposures = exps
        self.timestamps = ts

    def __len__(self):
        return len(self.files)

    def get_timestamp(self, idx: int) -> float:
        if self.timestamps is not None and idx < len(self.timestamps):
            return float(self.timestamps[idx])
        return idx * 0.1

    def get_image(self, idx: int) -> dict:
        raw = _read_gray(self.zf, self.files[idx])
        if raw is None:
            raise IOError(f"failed to read {self.files[idx]}")
        if raw.ndim == 3:
            raw = cv2.cvtColor(raw, cv2.COLOR_BGR2GRAY)
        exposure = float(self.exposures[idx]) if self.exposures is not None else 1.0
        if self.native is not None and raw.dtype == np.uint8:
            img = self.native.process(raw)
        else:
            irr, exposure = self.photo.process(raw, exposure)
            img = self.undistorter.undistort_image(irr)

        mask = None
        if self.mask_files and idx < len(self.mask_files):
            m = _read_gray(None, self.mask_files[idx], cv2.IMREAD_GRAYSCALE)
            if m is not None:
                mask = self.undistorter.resize_nearest(m).astype(np.float32)
        bgr = None
        if self.color_files and idx < len(self.color_files):
            c = _read_gray(None, self.color_files[idx], cv2.IMREAD_COLOR)
            if c is not None:
                bgr = self.undistorter.resize_nearest(c)
        return dict(
            image=img, mask=mask, bgr=bgr,
            exposure=exposure, timestamp=self.get_timestamp(idx), id=idx,
        )
