"""Cross-keyframe acceptPatch semantics (reference MapPoint.cpp:121-232).

The key scenario (round-2 verdict, Missing #4): a cluster whose OWN sparse
depths lie on the fitted plane (so the within-cluster gate passes) but whose
plane contradicts the assembled multi-keyframe world cloud inside the
patch's bounding box (so the reference rejects it)."""

import numpy as np

from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.nalo.dense_map import accept_patch, accept_patch_world

K = np.array([[250.0, 0, 159.5], [0, 250.0, 119.5], [0, 0, 1.0]])
Ki = np.linalg.inv(K)

# Slightly tilted near-frontal plane (z = 5 + 0.1 x): the patch's world
# bounding box gets nonzero extent on every axis, and the normal stays
# near-axis-aligned (|n_z| = 0.995 > 0.8).
_n = np.array([-0.1, 0.0, 1.0])
_n /= np.linalg.norm(_n)
PLANE_CAM = np.concatenate([_n, [-5.0 * _n[2]]])


def make_patch(n_pts=40, plane=PLANE_CAM, seed=0):
    """Cluster pixels lying exactly on the given camera-frame plane."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(80, 240, n_pts)
    v = rng.uniform(60, 180, n_pts)
    rays = (Ki @ np.stack([u, v, np.ones(n_pts)])).T
    idp = -(rays @ plane[:3]) / plane[3]
    return np.stack([u, v, idp], 1)


def cloud_on_plane(plane=PLANE_CAM, n=300, seed=1, jitter=0.002, z_shift=0.0):
    """Sparse world points on (or shifted off) the plane, identity camera."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.5, 1.5, n)
    y = rng.uniform(-1.0, 1.0, n)
    # plane: n.p + d = 0 -> z = -(d + nx x + ny y)/nz
    z = -(plane[3] + plane[0] * x + plane[1] * y) / plane[2]
    z = z + z_shift + rng.normal(scale=jitter, size=n)
    return np.stack([x, y, z], 1)


def test_accepts_consistent_patch():
    patch = make_patch()
    sw = cloud_on_plane()
    assert accept_patch_world(patch, PLANE_CAM, SE3(), sw, Ki)


def test_rejects_cross_kf_inconsistent_patch():
    """Passes the within-cluster gate, fails the cross-KF consistency."""
    patch = make_patch()
    cluster = {"u": patch[:, 0], "v": patch[:, 1], "idepth": patch[:, 2]}
    # within-cluster gate: the plane explains the cluster's own depths
    assert accept_patch(cluster, PLANE_CAM[:3], PLANE_CAM[3], Ki)
    # but the window's assembled cloud sits 0.35 off the patch plane while
    # still inside the patch's bounding box in x/y (and clipped into z range)
    sw = cloud_on_plane(z_shift=0.35)
    patch_world = (Ki @ np.stack([patch[:, 0], patch[:, 1],
                                  np.ones(len(patch))])).T / patch[:, 2:3]
    lo, hi = patch_world.min(0), patch_world.max(0)
    sw[:, 2] = np.clip(sw[:, 2], lo[2] + 1e-4, hi[2] - 1e-4)
    sw[:, 0] = np.clip(sw[:, 0], lo[0] + 1e-4, hi[0] - 1e-4)
    sw[:, 1] = np.clip(sw[:, 1], lo[1] + 1e-4, hi[1] - 1e-4)
    assert not accept_patch_world(patch, PLANE_CAM, SE3(), sw, Ki,
                                  mean_dist_th=0.1, plane_dis_th=0.01)


def test_rejects_small_patch_and_empty_box():
    patch = make_patch(n_pts=5)
    sw = cloud_on_plane()
    assert not accept_patch_world(patch, PLANE_CAM, SE3(), sw, Ki)
    # box with almost no sparse points (< 20): reference fitPlane refuses
    patch2 = make_patch()
    assert not accept_patch_world(patch2, PLANE_CAM, SE3(), sw[:5], Ki)


def test_rejects_oblique_normal():
    """Normal not near axis-aligned (max |n_i| <= 0.8) is rejected."""
    s2 = 1 / np.sqrt(2)
    plane = np.array([s2, 0.0, s2, -5.0 * s2])
    patch = make_patch(plane=plane)
    sw = cloud_on_plane(plane=plane)
    assert not accept_patch_world(patch, plane, SE3(), sw, Ki)
