"""End-to-end CLI test: synthetic dataset written to disk as PNGs,
processed through the full reader -> FullSystem -> result.txt path."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nalo_slam_tpu import main as cli
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib
from test_full_system import make_trajectory


@pytest.mark.slow
def test_cli_runs_dataset(tmp_path, monkeypatch):
    calib = default_calib(320, 240)
    scene = PlaneScene(calib, z0=3.0)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    n = 14
    gt = make_trajectory(n)
    for k in range(n):
        img, _ = scene.render(gt[k])
        cv2.imwrite(str(img_dir / f"{k:06d}.png"), np.clip(img, 0, 255).astype(np.uint8))
    calib_file = tmp_path / "camera.txt"
    calib_file.write_text(
        f"Pinhole {calib.fx[0]} {calib.fy[0]} {calib.cx[0]} {calib.cy[0]} 0\n"
        "320 240\nnone\n320 240\n"
    )
    monkeypatch.chdir(tmp_path)
    rc = cli.run([
        f"files={img_dir}", f"calib={calib_file}",
        "mode=1", "preset=2", "lidar=0", "dense=0", "planeOpt=0",
        "output=result.txt",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "result.txt")
    rows = np.loadtxt(tmp_path / "result.txt")
    assert rows.shape[1] == 8
    assert len(rows) >= 4
