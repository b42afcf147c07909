"""MP-mask offline-learning loop, end to end (scaled down for CI).

Drives tools/mpmask_e2e.py: synthetic-LiDAR projected labels ->
mesh-sharded BTS training (converging silog) -> eval vs dense GT ->
one SLAM pass with the net generating the mask prior on device
(FullSystem.set_mask_predictor).  The committed full-size evidence is
docs/mpmask/r5_report.json.
"""

import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_mpmask_train_eval_slam(tmp_path):
    sys.path.insert(0, "tools")
    from tools.mpmask_e2e import main

    rep = main([f"out={tmp_path}", "frames=16", "h=64", "w=96",
                "steps=60", "slam_frames=14", "scan_lines=16"])
    # silog must drop decisively (>=40%) -- an un-learning run stalls flat
    assert rep["silog_last"] < 0.6 * rep["silog_first"], rep
    # the net's depth must carry signal vs the dense ground truth
    assert rep["eval"]["d3"] > 0.5, rep
    # the SLAM pass with on-device net masks stays healthy
    assert rep["slam_poses"] >= 5
    assert rep["slam_ate_m"] < 0.05
