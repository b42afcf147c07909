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
               bgr=None, stride=3, seed=0, cam_to_world=None,
               sparse_world=None) -> MapPointCloud | None:
    """Dense surfel generation for one keyframe (reference :234-407).

    When cam_to_world + sparse_world (the assembled multi-KF world cloud,
    key_frame_map over the window) are given, patches are validated with the
    full cross-keyframe acceptPatch semantics (MapPoint.cpp:121-232);
    otherwise the within-cluster depth gate is used."""
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
        if cam_to_world is not None and sparse_world is not None:
            patch = np.stack([c["u"], c["v"], c["idepth"]], 1)
            if not accept_patch_world(patch, np.concatenate([n, [d]]),
                                      cam_to_world, sparse_world, Ki,
                                      seed=seed + i):
                continue
        elif not accept_patch(c, n, d, Ki):
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
    """Within-cluster plane/sparse depth gate -- the fallback when no
    multi-keyframe world cloud is available (e.g. unit-scale callers).
    For the reference's full cross-KF semantics see accept_patch_world."""
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


def accept_patch_world(patch_uvi, plane_cam, cam_to_world, sparse_world, Ki,
                       plane_dis_th: float = 0.5, mean_dist_th: float = 2.0,
                       axis_th: float = 0.8, seed: int = 0):
    """Full acceptPatch semantics (reference MapPoint.cpp:121-232): validate
    one plane patch against the ASSEMBLED multi-keyframe sparse cloud.

    patch_uvi:    (n, 3) [u, v, idepth] cluster pixels in the host camera
    plane_cam:    (4,) [nx, ny, nz, d] patch plane in host-camera coords
    cam_to_world: host SE3
    sparse_world: (N, 3) world points of ALL window keyframes (key_frame_map)

    Steps: (1) >= 10 patch points; (2) world AABB of the patch;
    (3) PassThrough-style x/y/z box filter of the sparse cloud;
    (4) RANSAC plane through the in-box sparse points (>= 20, like
    fitPlane :560-562); (5) accept when the in-box sparse plane matches
    the patch plane (||pi - wplane||^2 < 0.5) OR the mean sparse-point-to-
    patch-plane distance < 2, AND the patch normal is near axis-aligned
    (max |n_i| > 0.8).
    """
    patch_uvi = np.asarray(patch_uvi, np.float64)
    if len(patch_uvi) < 10:
        return False
    good = patch_uvi[:, 2] > 1e-6
    if good.sum() < 10:
        return False
    u, v, idp = patch_uvi[good, 0], patch_uvi[good, 1], patch_uvi[good, 2]
    rays = (Ki @ np.stack([u, v, np.ones(len(u))])).T
    cam_pts = rays / idp[:, None]
    wpts = cam_pts @ cam_to_world.R.T + cam_to_world.t
    finite = np.all(np.isfinite(wpts), axis=1)
    if finite.sum() < 10:
        return False
    wpts = wpts[finite]
    lo = wpts.min(axis=0)
    hi = wpts.max(axis=0)

    sw = np.asarray(sparse_world, np.float64)
    inbox = np.all((sw >= lo) & (sw <= hi), axis=1)
    box_pts = sw[inbox]
    from .ransac import fit_plane_ransac
    if len(box_pts) < 20:  # fitPlane's cloud-size gate (:560-562)
        return False
    fit = fit_plane_ransac(box_pts, dist_th=0.01, seed=seed)
    if fit is None:
        return False
    pi = np.concatenate([fit[0], [fit[1]]])

    # patch plane in world coords: wplane = T_cw^{-T} plane  (:170-171)
    T = np.eye(4)
    T[:3, :3] = cam_to_world.R
    T[:3, 3] = cam_to_world.t
    wplane = np.linalg.inv(T).T @ np.asarray(plane_cam, np.float64)
    # plane 4-vectors are sign-ambiguous; compare the closer orientation
    plane_dis = min(np.sum((pi - wplane) ** 2), np.sum((pi + wplane) ** 2))

    nrm = np.linalg.norm(wplane[:3])
    if nrm < 1e-9:
        return False
    mean_dist = float(np.mean(np.abs(box_pts @ wplane[:3] + wplane[3])) / nrm)

    axis_aligned = np.max(np.abs(np.asarray(plane_cam[:3]))) / max(
        np.linalg.norm(plane_cam[:3]), 1e-9) > axis_th
    return bool((plane_dis < plane_dis_th or mean_dist < mean_dist_th)
                and axis_aligned)


def key_frame_map(point_u, point_v, point_idepth, cam_to_world, K):
    """Sparse world cloud of one keyframe (reference keyFrameMap :19-43)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ok = point_idepth > 1e-6
    z = 1.0 / point_idepth[ok]
    x = (point_u[ok] - cx) / fx * z
    y = (point_v[ok] - cy) / fy * z
    pts = np.stack([x, y, z], 1)
    return pts @ cam_to_world.R.T + cam_to_world.t
