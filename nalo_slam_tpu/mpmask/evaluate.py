"""Depth-prediction metrics (reference mp_mask/utils/eval_with_pngs.py:50-71)."""

from __future__ import annotations

import numpy as np


def compute_errors(gt: np.ndarray, pred: np.ndarray) -> dict:
    thresh = np.maximum(gt / pred, pred / gt)
    d1 = (thresh < 1.25).mean()
    d2 = (thresh < 1.25**2).mean()
    d3 = (thresh < 1.25**3).mean()

    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())

    abs_rel = (np.abs(gt - pred) / gt).mean()
    sq_rel = (((gt - pred) ** 2) / gt).mean()

    err = np.log(pred) - np.log(gt)
    silog = np.sqrt((err**2).mean() - (err.mean()) ** 2) * 100

    log10 = np.abs(np.log10(gt) - np.log10(pred)).mean()
    return dict(
        silog=silog, abs_rel=abs_rel, log10=log10, rmse=rmse,
        sq_rel=sq_rel, rmse_log=rmse_log, d1=d1, d2=d2, d3=d3,
    )


def garg_crop_mask(h: int, w: int) -> np.ndarray:
    m = np.zeros((h, w), bool)
    m[int(0.40810811 * h) : int(0.99189189 * h),
      int(0.03594771 * w) : int(0.96405229 * w)] = True
    return m


def eigen_crop_mask(h: int, w: int) -> np.ndarray:
    m = np.zeros((h, w), bool)
    m[int(0.3324324 * h) : int(0.91351351 * h),
      int(0.0359477 * w) : int(0.96405229 * w)] = True
    return m
