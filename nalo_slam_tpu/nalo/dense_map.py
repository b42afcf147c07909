"""Dense surfel mapping from mask-plane clusters.

Rebuild of DenseMapping (reference: src/FullSystem/MapPoint.cpp):
* update_map (:234-407): cluster the host keyframe's active + immature
  points by MP-mask value, RANSAC a plane per cluster, then fill every
  3rd pixel of the cluster region with the plane inverse depth
  idepth = -(n . Ki u) / d, gated by a 30 m extent sanity check;
* key_frame_map (:19-43): the sparse world cloud of a keyframe;
* refine/accept (:46-232): plane-vs-sparse-cloud consistency -- a patch is
  accepted when the plane depths agree with the sparse depths inside the
  region (replaces the PCL PassThrough pipeline).
"""

from __future__ import annotations

import numpy as np

from .dense_frontend import cluster_by_mask, fit_cluster_plane

MAX_EXTENT_M = 30.0


class MapPointCloud:
    """Per-keyframe dense points: pixel coords + inverse depth + colors."""

    def __init__(self, u, v, idepth, color, bgr=None):
        self.u = u
        self.v = v
        self.idepth = idepth
        self.color = color
        self.bgr = bgr

    def world_points(self, cam_to_world, K):
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        z = 1.0 / self.idepth
        x = (self.u - cx) / fx * z
        y = (self.v - cy) / fy * z
        pts = np.stack([x, y, z], 1)
        return pts @ cam_to_world.R.T + cam_to_world.t


def update_map(mask, point_u, point_v, point_idepth, intensity, Ki, w, h,
               bgr=None, stride=3, seed=0) -> MapPointCloud | None:
    """Dense surfel generation for one keyframe (reference :234-407)."""
    clusters = cluster_by_mask(point_u, point_v, point_idepth, mask, w, h)
    out_u, out_v, out_id, out_c, out_b = [], [], [], [], []
    for i, c in enumerate(clusters):
        if c["value"] == 0 or len(c["u"]) < 20:
            continue
        plane = fit_cluster_plane(c, Ki, seed=seed + i)
        if plane is None:
            continue
        n, d, _score = plane
        minx, maxx = int(c["u"].min()), int(c["u"].max())
        miny, maxy = int(c["v"].min()), int(c["v"].max())
        xs = np.arange(max(minx, 1), min(maxx, w - 1), stride)
        ys = np.arange(max(miny, 1), min(maxy, h - 1), stride)
        if len(xs) == 0 or len(ys) == 0:
            continue
        gx, gy = np.meshgrid(xs, ys)
        gx, gy = gx.ravel(), gy.ravel()
        inmask = mask[gy, gx] == c["value"]
        gx, gy = gx[inmask], gy[inmask]
        if len(gx) == 0:
            continue
        rays = (Ki @ np.stack([gx, gy, np.ones(len(gx))])).T
        idp = (rays @ n) / (-d)
        ok = idp > 1.0 / MAX_EXTENT_M  # 30 m sanity gate (:388-395)
        if not accept_patch(c, n, d, Ki):
            continue
        out_u.append(gx[ok])
        out_v.append(gy[ok])
        out_id.append(idp[ok])
        out_c.append(intensity[gy[ok], gx[ok]])
        if bgr is not None:
            out_b.append(bgr[gy[ok], gx[ok]])
    if not out_u:
        return None
    return MapPointCloud(
        np.concatenate(out_u).astype(np.float32),
        np.concatenate(out_v).astype(np.float32),
        np.concatenate(out_id).astype(np.float32),
        np.concatenate(out_c).astype(np.float32),
        np.concatenate(out_b) if out_b else None,
    )


def accept_patch(cluster, n, d, Ki, rel_th: float = 0.3, min_frac: float = 0.5):
    """Plane/sparse consistency gate (reference refineMap/acceptPatch
    :46-232 semantics): the plane must explain most sparse depths in the
    cluster to within rel_th relative error."""
    u, v, idp = cluster["u"], cluster["v"], cluster["idepth"]
    good = idp > 1e-6
    if good.sum() < 5:
        return False
    rays = (Ki @ np.stack([u[good], v[good], np.ones(good.sum())])).T
    plane_id = (rays @ n) / (-d)
    ok = plane_id > 1e-6
    if ok.sum() < 5:
        return False
    rel = np.abs(plane_id[ok] - idp[good][ok]) / idp[good][ok]
    return (rel < rel_th).mean() >= min_frac


def key_frame_map(point_u, point_v, point_idepth, cam_to_world, K):
    """Sparse world cloud of one keyframe (reference keyFrameMap :19-43)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ok = point_idepth > 1e-6
    z = 1.0 / point_idepth[ok]
    x = (point_u[ok] - cx) / fx * z
    y = (point_v[ok] - cy) / fy * z
    pts = np.stack([x, y, z], 1)
    return pts @ cam_to_world.R.T + cam_to_world.t
