import numpy as np
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.system import FullSystem
from nalo_slam_tpu.system.checkpoint import load_checkpoint, save_checkpoint
from nalo_slam_tpu.utils.metrics import MetricsLogger
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib
from test_full_system import make_trajectory


@pytest.mark.slow
def test_checkpoint_roundtrip_and_resume(tmp_path):
    s = Settings(
        max_window_frames=8, max_points=2048, max_immature_per_frame=512,
        desired_point_density=600.0, desired_immature_density=400.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    calib = default_calib(320, 240)
    scene = PlaneScene(calib, z0=3.0)
    gt = make_trajectory(20)
    sys1 = FullSystem(s, calib)
    for k in range(14):
        img, _ = scene.render(gt[k])
        sys1.add_frame(img, 1.0, float(k), k)
    assert sys1.initialized

    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, sys1)

    sys2 = FullSystem(s, calib)
    load_checkpoint(ckpt, sys2)
    assert sys2.initialized
    assert sys2.window.n_frames == sys1.window.n_frames
    np.testing.assert_allclose(sys2.window.HM, sys1.window.HM)
    np.testing.assert_allclose(
        sys2.window.frames[-1].PRE_worldToCam.matrix(),
        sys1.window.frames[-1].PRE_worldToCam.matrix(),
    )
    # the full pre-checkpoint trajectory survives the roundtrip
    t1 = sys1.trajectory()
    t2 = sys2.trajectory()
    assert len(t2) == len(t1)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-6)

    # tracking continues after resume: feed more frames and verify the
    # poses stay close to a fresh uninterrupted run
    for k in range(14, 20):
        img, _ = scene.render(gt[k])
        sys2.add_frame(img, 1.0, float(k), k)
        sys1.add_frame(img, 1.0, float(k), k)
    assert not sys2.is_lost and sys2.all_shells[-1].poseValid
    p1 = sys1.all_shells[-1].camToWorld
    p2 = sys2.all_shells[-1].camToWorld
    assert np.linalg.norm(p1.t - p2.t) < 0.05 * max(np.linalg.norm(p1.t), 0.1)


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path / "m.jsonl"))
    log.frame(12.5, is_kf=False)
    log.frame(80.0, is_kf=True)
    log.keyframe(3, 1.23, 800, 6, (0, 5), stages={"total": 700.0, "optimize": 300.0})
    log.bump("points_activated", 42)
    s = log.summary()
    assert s["points_activated"] == 42
    assert s["track_ms_median"] == pytest.approx(46.25)
    assert s["map_ms_median"] == 700.0
    assert s["kf_stage_ms_median"]["optimize"] == 300.0
    log.close()
    lines = open(str(tmp_path / "m.jsonl")).readlines()
    assert len(lines) == 3
