"""End-to-end smoke test on a synthetic plane sequence."""

import numpy as np
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.system import FullSystem
from nalo_slam_tpu.utils.evaluate import ate_rmse
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib


def make_trajectory(n):
    """Sideways + slight forward dolly with gentle yaw."""
    poses = []
    for k in range(n):
        xi = np.array([0.08 * k, 0.01 * np.sin(0.2 * k), 0.02 * k,
                       0.0, 0.004 * np.sin(0.15 * k), 0.0])
        poses.append(SE3.exp(xi))
    return poses


@pytest.mark.slow
def test_synthetic_sequence_tracks():
    s = Settings(
        max_window_frames=8, max_points=4096, max_immature_per_frame=1024,
        desired_point_density=800.0, desired_immature_density=600.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    calib = default_calib(320, 240)
    scene = PlaneScene(calib, z0=3.0)
    n = 18
    gt = make_trajectory(n)
    sys_ = FullSystem(s, calib)
    for k in range(n):
        img, _ = scene.render(gt[k])
        sys_.add_frame(img, exposure=1.0, timestamp=float(k), incoming_id=k)
        assert not sys_.is_lost, f"lost at frame {k}"
        assert not sys_.init_failed, f"init failed at frame {k}"

    assert sys_.initialized, "never initialized"
    assert sys_.statistics["n_keyframes"] >= 3

    rows = sys_.trajectory()
    # frames consumed by the initializer have poseValid=False
    assert len(rows) >= n - 10
    est = {int(r[0]): np.array(r[1:4]) for r in rows}
    ks = sorted(est.keys())
    est_xyz = np.stack([est[k] for k in ks])
    gt_xyz = np.stack([gt[k].t for k in ks])
    ate = ate_rmse(est_xyz, gt_xyz, with_scale=True)
    assert ate < 0.05, f"ATE {ate:.4f} m on synthetic plane sequence"


@pytest.mark.slow
def test_pipelined_system_matches_sequential():
    from nalo_slam_tpu.system import PipelinedSystem

    s = Settings(
        max_window_frames=8, max_points=4096, max_immature_per_frame=1024,
        desired_point_density=800.0, desired_immature_density=600.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    calib = default_calib(320, 240)
    scene = PlaneScene(calib, z0=3.0)
    n = 16
    gt = make_trajectory(n)
    sys_ = FullSystem(s, calib)
    pipe = PipelinedSystem(sys_)
    for k in range(n):
        img, _ = scene.render(gt[k])
        pipe.add_frame(img, 1.0, float(k), k)
    pipe.finish()
    assert sys_.initialized
    assert not sys_.is_lost
    rows = sys_.trajectory()
    assert len(rows) >= 6
    est = {int(r[0]): np.array(r[1:4]) for r in rows}
    ks = sorted(est.keys())
    est_xyz = np.stack([est[k] for k in ks])
    gt_xyz = np.stack([gt[k].t for k in ks])
    assert ate_rmse(est_xyz, gt_xyz, with_scale=True) < 0.08
