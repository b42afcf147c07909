"""NALO dense frontend: mask clustering, plane densification, ground lock.

Rebuild of the dense_track extension of CoarseTracker::makeCoarseDepthL0
(reference: src/FullSystem/CoarseTracker.cpp:185-290 makeMaskDistMap,
:299-378 fitPlane, :540-824 densification + ground-height state machine):

* projected reference points are grouped by their MP-mask value
  (makeMaskDistMap's duplicate-value clustering is a group-by),
* each cluster gets a RANSAC plane in camera space (dist 0.01); the ground
  score prefers large, far-from-x/z-axis, low clusters (:362-374),
* plane points are re-sampled every 5th pixel inside the cluster's bbox
  where the mask matches, with idepth = (n . Ki u) / -d (:637-657),
* the ground height drives the scale-fix state machine: lock after 3
  consecutive heights within 0.01, then reject scale-rate outliers against
  rolling means of the last 2..5 rates (:696-816).

Host-side numpy: runs once per keyframe on a few thousand points.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .ransac import fit_plane_ransac


@dataclass
class GroundState:
    """Scale-fix state (reference settings.cpp:34-42 globals + :696-816)."""
    scale_fix: bool = False
    init_height: float = -1.0
    last_height: float = -1.0
    suc_num: int = 0
    last_scale_rate: float = -1.0
    last_gp: np.ndarray = field(default_factory=lambda: np.full(4, -1.0))
    old_rate: list = field(default_factory=list)


def cluster_by_mask(us, vs, idepths, mask, w, h):
    """Group projected points by mask value; returns clusters sorted by size
    (descending), each dict(u, v, idepth, value)."""
    ui = us.astype(int)
    vi = vs.astype(int)
    keep = (ui > 2) & (ui < w - 2) & (vi > 2) & (vi < h - 2)
    ui, vi, idp = ui[keep], vi[keep], idepths[keep]
    vals = mask[vi, ui]
    clusters = []
    for val in np.unique(vals):
        m = vals == val
        clusters.append(dict(u=ui[m], v=vi[m], idepth=idp[m], value=float(val)))
    clusters.sort(key=lambda c: len(c["u"]), reverse=True)
    return clusters


def fit_cluster_plane(cluster, Ki, seed=0):
    """Camera-space plane fit + ground score (reference fitPlane :299-378).
    Returns (normal, d, score) or None."""
    u, v, idp = cluster["u"], cluster["v"], cluster["idepth"]
    good = idp > 1e-6
    if good.sum() < 20:
        return None
    rays = (Ki @ np.stack([u[good], v[good], np.ones(good.sum())])).T
    pts = rays / idp[good][:, None]
    if not np.all(np.isfinite(pts)):
        return None
    res = fit_plane_ransac(pts, dist_th=0.01, seed=seed)
    if res is None:
        return None
    n, d, _ = res
    mid_z = pts[:, 2].mean()
    if len(u) < 100 or mid_z < 0 or cluster["value"] < 200:
        score = 9999999.0
    else:
        dot = float(n[0] + n[2])  # x-axis + z-axis alignment penalty
        score = dot * 1000.0 + abs(d) * 100.0 + 100.0 / len(u)
    return n, d, score


def densify_planes(clusters, planes, mask, dI0_intensity, Ki, w, h, stride=5):
    """Uniform re-sampling of plane pixels (reference :637-657).
    Returns (u, v, idepth, color) arrays of the new dense points."""
    new_u, new_v, new_id, new_c = [], [], [], []
    for cluster, plane in zip(clusters, planes):
        if plane is None or cluster["value"] == 0:
            continue
        n, d, _ = plane
        minx, maxx = cluster["u"].min(), cluster["u"].max()
        miny, maxy = cluster["v"].min(), cluster["v"].max()
        if maxx > w - 1 or minx < 1 or maxy > h - 1 or miny < 1:
            continue
        xs = np.arange(minx + (-minx) % stride, maxx, stride)
        ys = np.arange(miny + (-miny) % stride, maxy, stride)
        if len(xs) == 0 or len(ys) == 0:
            continue
        gx, gy = np.meshgrid(xs, ys)
        gx, gy = gx.ravel(), gy.ravel()
        inmask = mask[gy, gx] == cluster["value"]
        gx, gy = gx[inmask], gy[inmask]
        if len(gx) == 0:
            continue
        rays = (Ki @ np.stack([gx, gy, np.ones(len(gx))])).T
        idp = (rays @ n) / (-d)
        ok = idp > 1e-4
        new_u.append(gx[ok])
        new_v.append(gy[ok])
        new_id.append(idp[ok])
        new_c.append(dI0_intensity[gy[ok], gx[ok]])
    if not new_u:
        return None
    return (np.concatenate(new_u), np.concatenate(new_v),
            np.concatenate(new_id), np.concatenate(new_c))


def update_ground_state(gs: GroundState, ground_height: float, gp_raw: np.ndarray):
    """The scale-fix / outlier-filter state machine (reference :696-816).
    Returns (have_ground, groundP) for the newest keyframe."""
    have_ground = False
    gp_out = gp_raw.copy()
    if not gs.scale_fix:
        if gs.last_height < 0:
            gs.last_height = ground_height
        else:
            if abs(gs.last_height - ground_height) < 0.01:
                gs.suc_num += 1
            else:
                gs.suc_num = 0
            if gs.suc_num > 3:
                gs.init_height = 0.5 * (ground_height + gs.last_height)
                gs.scale_fix = True
            gs.last_height = ground_height
    else:
        rate = ground_height / gs.init_height
        if gs.last_scale_rate < 0:
            gs.last_scale_rate = rate
            gs.last_gp = gp_raw.copy()
            gs.old_rate.append(rate)
        else:
            aves = [rate] * 4
            size = len(gs.old_rate)
            for k, navg in enumerate((2, 3, 4, 5)):
                if size >= navg:
                    aves[k] = abs(sum(gs.old_rate[-navg:]) / navg)
            diffs = [abs(gs.last_scale_rate - rate) / max(gs.last_scale_rate, 1e-9)]
            diffs += [abs(a - rate) / max(a, 1e-9) for a in aves]
            if all(d > 0.25 for d in diffs):
                # outlier: keep last accepted plane
                gp_out = gs.last_gp.copy()
            else:
                gs.last_scale_rate = rate
                have_ground = True
            gs.old_rate.append(gs.last_scale_rate)
            if len(gs.old_rate) > 7:
                gs.old_rate.pop(0)
    return have_ground, gp_out


def dense_frontend_update(mask, us, vs, idepths, dI0_intensity, Ki, w, h,
                          gs: GroundState, seed=0):
    """Full per-keyframe dense-frontend pass.  Returns dict with the dense
    points to add to the tracker's level-0 reference map, the ground plane
    of this frame, and the on-ground point pixel set."""
    clusters = cluster_by_mask(us, vs, idepths, mask, w, h)
    if len(clusters) < 4:
        return None
    planes = [fit_cluster_plane(c, Ki, seed=seed + i) for i, c in enumerate(clusters)]
    # ground = lowest-score plane (:610-625)
    min_score = np.inf
    gp_raw = np.zeros(4)
    ground_height = 0.0
    g_pix = None
    for c, p in zip(clusters, planes):
        if p is None:
            continue
        n, d, score = p
        if score < min_score:
            sign = -1.0 if n[1] > 0 else 1.0
            gp_raw = sign * np.array([n[0], n[1], n[2], d])
            ground_height = abs(d)
            min_score = score
            g_pix = np.stack([c["u"], c["v"]], 1)
    dense = densify_planes(clusters, planes, mask, dI0_intensity, Ki, w, h)
    have_ground, gp_out = (False, gp_raw)
    if np.isfinite(min_score) and min_score < 9999999.0:
        have_ground, gp_out = update_ground_state(gs, ground_height, gp_raw)
    return dict(
        dense=dense, have_ground=have_ground, groundP=gp_out,
        ground_height=ground_height, ground_pixels=g_pix,
    )
