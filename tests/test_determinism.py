"""Determinism: two identical runs produce identical trajectories.

The reference relies on fixed seeds (srand(3141592), PixelSelector2.cpp:44)
but has no test; the rebuild asserts bit-level reproducibility of the full
pipeline (SURVEY.md §5 race-detection/determinism plan).
"""

import numpy as np
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.system import FullSystem
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib
from test_full_system import make_trajectory


@pytest.mark.slow
def test_two_runs_identical():
    s = Settings(
        max_window_frames=8, max_points=2048, max_immature_per_frame=512,
        desired_point_density=600.0, desired_immature_density=400.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    calib = default_calib(320, 240)
    scene = PlaneScene(calib, z0=3.0)
    gt = make_trajectory(14)
    frames = [scene.render(g)[0] for g in gt]

    def run():
        sys_ = FullSystem(s, calib)
        for k, img in enumerate(frames):
            sys_.add_frame(img, 1.0, float(k), k)
        return np.array([r[1:4] for r in sys_.trajectory()])

    a = run()
    b = run()
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)
