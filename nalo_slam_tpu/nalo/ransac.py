"""Vectorized plane RANSAC (replaces pcl::SACSegmentation, reference
src/FullSystem/CoarseTracker.cpp:340-378 and MapPoint.cpp:563-575).

All hypotheses are evaluated in one batch: sample S minimal 3-point sets,
form plane normals by cross product, count inliers within the distance
threshold, refine the best hypothesis by least squares on its inliers.
Runs in numpy on the host (a few clusters per keyframe, thousands of
points) -- the irregular part of the pipeline SURVEY.md §7 plans to keep
off-device.
"""

from __future__ import annotations

import numpy as np


def fit_plane_ransac(pts: np.ndarray, dist_th: float = 0.01, n_hyp: int = 256,
                     seed: int = 0):
    """pts (N,3) -> (normal (3,), d, inlier_mask) with n.p + d = 0 form
    (matches pcl ModelCoefficients [a b c d]).  Returns None if degenerate."""
    N = len(pts)
    if N < 3:
        return None
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, N, size=(n_hyp, 3))
    p0, p1, p2 = pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    norm = np.linalg.norm(n, axis=1)
    ok = norm > 1e-9
    if not ok.any():
        return None
    n = n[ok] / norm[ok][:, None]
    d = -np.einsum("hi,hi->h", n, p0[ok])
    dist = np.abs(pts @ n.T + d[None, :])  # (N, H)
    inliers = dist < dist_th
    counts = inliers.sum(0)
    best = int(np.argmax(counts))
    if counts[best] < 3:
        return None
    m = inliers[:, best]
    # least-squares refinement on inliers (seg.setOptimizeCoefficients(true))
    q = pts[m]
    c = q.mean(0)
    _, _, Vt = np.linalg.svd(q - c, full_matrices=False)
    n_ref = Vt[2]
    d_ref = -n_ref @ c
    m_ref = np.abs(pts @ n_ref + d_ref) < dist_th
    if m_ref.sum() >= counts[best]:
        return n_ref, float(d_ref), m_ref
    return pts[idx[ok][best]] if False else (np.asarray(n[best]), float(d[best]), m)
