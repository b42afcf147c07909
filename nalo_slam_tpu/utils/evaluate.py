"""Trajectory evaluation: ATE RMSE with (similarity) Umeyama alignment.

The reference writes TUM-format result.txt for external tools
(src/FullSystem/FullSystem.cpp:445-499); we bundle the standard metric.
"""

from __future__ import annotations

import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform dst ~ s*R @ src + t.  (N,3) each."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (xs**2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / var
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_xyz: np.ndarray, gt_xyz: np.ndarray, with_scale: bool = True) -> float:
    """Absolute trajectory error after alignment (Sim3 by default, since the
    rebuild is monocular)."""
    s, R, t = umeyama(est_xyz, gt_xyz, with_scale)
    aligned = (s * (R @ est_xyz.T)).T + t
    return float(np.sqrt(((aligned - gt_xyz) ** 2).sum(axis=1).mean()))
