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
    # the restored window can still run BA
    rmse = sys2.window.optimize_device(2)
    assert np.isfinite(rmse)


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path / "m.jsonl"))
    log.frame(12.5, is_kf=False)
    log.frame(80.0, is_kf=True)
    log.keyframe(3, 1.23, 800, 6, (0, 5))
    log.bump("points_activated", 42)
    s = log.summary()
    assert s["points_activated"] == 42
    assert s["track_ms_median"] == 12.5
    log.close()
    lines = open(str(tmp_path / "m.jsonl")).readlines()
    assert len(lines) == 3
