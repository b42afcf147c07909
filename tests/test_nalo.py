import numpy as np
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.nalo.ransac import fit_plane_ransac
from nalo_slam_tpu.nalo.dense_frontend import (GroundState, cluster_by_mask,
                                               dense_frontend_update,
                                               fit_cluster_plane,
                                               update_ground_state)
from nalo_slam_tpu.nalo.plane_opt import GlobalPlane
from nalo_slam_tpu.nalo import dense_map as dmap
from nalo_slam_tpu.nalo.tsdf import TSDFVolume
from nalo_slam_tpu.utils.synthetic import GroundWallScene, default_calib


def _scene_points(calib, scene, n=3000, rng=None):
    rng = rng or np.random.default_rng(0)
    img, idepth, mask = scene.render(SE3())
    h, w = img.shape
    us = rng.integers(3, w - 3, n)
    vs = rng.integers(3, h - 3, n)
    return img, mask, us.astype(np.float32), vs.astype(np.float32), idepth[vs, us]


class TestRansac:
    def test_recovers_plane(self, rng):
        n_gt = np.array([0.0, 1.0, 0.2])
        n_gt /= np.linalg.norm(n_gt)
        d_gt = -2.0
        basis = np.linalg.svd(n_gt[None])[2][1:]
        pts = rng.uniform(-3, 3, (400, 2)) @ basis - d_gt * n_gt
        pts += rng.normal(scale=0.002, size=pts.shape)
        outliers = rng.uniform(-5, 5, (60, 3))
        allp = np.concatenate([pts, outliers])
        n, d, m = fit_plane_ransac(allp, dist_th=0.01, seed=1)
        if n @ n_gt < 0:
            n, d = -n, -d
        np.testing.assert_allclose(n, n_gt, atol=0.02)
        np.testing.assert_allclose(d, d_gt, atol=0.05)
        assert m[:400].mean() > 0.9


class TestDenseFrontend:
    def test_cluster_and_ground_plane(self):
        calib = default_calib()
        scene = GroundWallScene(calib, y0=1.5, z_wall=8.0)
        img, mask, us, vs, idp = _scene_points(calib, scene)
        clusters = cluster_by_mask(us, vs, idp, mask, calib.w[0], calib.h[0])
        assert len(clusters) == 2
        vals = {c["value"] for c in clusters}
        assert vals == {230.0, 100.0}
        for c in clusters:
            p = fit_cluster_plane(c, calib.Ki[0], seed=3)
            assert p is not None
            n, d, score = p
            if c["value"] == 230.0:
                # ground: normal ~ (0, -1, 0) in cam frame (y down), |d| = 1.5
                assert abs(abs(n[1]) - 1.0) < 0.05, n
                assert abs(abs(d) - 1.5) < 0.1, d
                assert score < 9999999
            else:
                # wall: normal ~ z
                assert abs(abs(n[2]) - 1.0) < 0.05, n

    def test_full_update_densifies_and_grounds(self):
        calib = default_calib()
        scene = GroundWallScene(calib)
        img, mask, us, vs, idp = _scene_points(calib, scene)
        # the two-surface synthetic scene yields only 2 mask labels; the
        # reference's update requires >= 4 clusters (CoarseTracker dense
        # path), so split the wall region into two extra labels
        wall_rows = np.nonzero((mask == 100).any(1))[0]
        if len(wall_rows) > 4:
            r0 = wall_rows[: len(wall_rows) // 2]
            mask[r0[:, None], np.arange(mask.shape[1] // 2)] = 50
            mask[r0[:, None],
                 np.arange(mask.shape[1] // 2, mask.shape[1])] = 150
        gs = GroundState()
        out = dense_frontend_update(mask, us, vs, idp, img, calib.Ki[0],
                                    calib.w[0], calib.h[0], gs)
        assert out is not None, "expected >= 4 clusters after label split"
        assert out["ground_height"] == pytest.approx(1.5, abs=0.1)
        if out["dense"] is not None:
            du, dv, did, dc = out["dense"]
            # densified idepths match ground truth at those pixels
            _, gt_id, _ = scene.render(SE3())
            rel = np.abs(did - gt_id[dv.astype(int), du.astype(int)]) / gt_id[dv.astype(int), du.astype(int)]
            assert np.median(rel) < 0.05

    def test_ground_state_locks_and_filters(self):
        gs = GroundState()
        for _ in range(6):
            update_ground_state(gs, 1.5, np.array([0, -1, 0, -1.5]))
        assert gs.scale_fix
        assert gs.init_height == pytest.approx(1.5)
        # inlier rates accepted; build >= 5 entries of history (the filter
        # falls back to the raw rate with less, exactly like the reference)
        for hgt in (1.52, 1.49, 1.51, 1.50, 1.52, 1.51):
            have, gp = update_ground_state(gs, hgt, np.array([0, -1, 0, -hgt]))
            assert have
        # single huge outlier rejected -> keeps last plane
        have, gp = update_ground_state(gs, 3.5, np.array([0, -1, 0, -3.5]))
        assert not have
        np.testing.assert_allclose(abs(gp[3]), 1.51, atol=0.05)


class TestGlobalPlane:
    def test_lock_on_consistency(self):
        from nalo_slam_tpu.backend.window import FrameState
        s = Settings()
        frames = []
        planes = []
        for k in range(7):
            fs = FrameState(k, None, 1.0, s)
            fs.set_eval_pt_scaled(SE3.exp(np.array([0.1 * k, 0, 0, 0, 0, 0])), 0, 0)
            frames.append(fs)
            planes.append(np.array([0.0, -1.0, 0.0, -1.5]))
        gp = GlobalPlane()
        assert gp.set_global_plane(frames, planes, s.max_frames)
        assert gp.fixed
        assert gp.lgh == pytest.approx(-1.5)
        # world plane normal ~ (0,-1,0) since poses are translations
        np.testing.assert_allclose(gp.gplane[:3], [0, -1, 0], atol=1e-6)

    def test_reject_inconsistent(self):
        from nalo_slam_tpu.backend.window import FrameState
        s = Settings()
        frames = [FrameState(k, None, 1.0, s) for k in range(7)]
        for f in frames:
            f.set_eval_pt_scaled(SE3(), 0, 0)
        rng = np.random.default_rng(0)
        planes = [np.array([0, -1, 0, -1.5]) + rng.normal(scale=0.3, size=4)
                  for _ in range(7)]
        gp = GlobalPlane()
        assert not gp.set_global_plane(frames, planes, s.max_frames)


class TestDenseMap:
    def test_update_map_fills_ground(self):
        calib = default_calib()
        scene = GroundWallScene(calib)
        img, mask, us, vs, idp = _scene_points(calib, scene, n=4000)
        cloud = dmap.update_map(mask, us, vs, idp, img, calib.Ki[0],
                                calib.w[0], calib.h[0])
        assert cloud is not None
        assert len(cloud.u) > 500
        _, gt_id, _ = scene.render(SE3())
        rel = np.abs(cloud.idepth - gt_id[cloud.v.astype(int), cloud.u.astype(int)])
        rel = rel / gt_id[cloud.v.astype(int), cloud.u.astype(int)]
        assert np.median(rel) < 0.05
        # world export works
        w_pts = cloud.world_points(SE3(), calib.K[0])
        assert w_pts.shape == (len(cloud.u), 3)


class TestTSDF:
    def test_point_fusion_marks_surface(self):
        vol = TSDFVolume(size_m=4.0, resolution=64)
        pts = np.stack([np.linspace(-1, 1, 500), np.zeros(500), np.zeros(500)], 1)
        vol.integrate_points(pts)
        occ = vol.occupied_points(th=0.5)
        assert len(occ) > 10
        assert np.abs(occ[:, 1]).max() < 0.1
        assert np.abs(occ[:, 2]).max() < 0.1

    def test_depth_fusion(self):
        calib = default_calib(64, 48, f=50.0)
        vol = TSDFVolume(size_m=8.0, resolution=64)
        depth = np.full((48, 64), 2.0, np.float32)
        vol.integrate_depth(depth, calib.K[0], SE3())
        occ = vol.occupied_points(th=0.6)
        assert len(occ) > 0
        # surface voxels near z = 2
        assert np.median(np.abs(occ[:, 2] - 2.0)) < 0.3
