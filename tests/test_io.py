import os

import numpy as np
import pytest

from nalo_slam_tpu.io.undistort import Undistorter
from nalo_slam_tpu.io.photometric import PhotometricUndistorter, GammaCalib
from nalo_slam_tpu.io.results import write_pcd, read_pcd, write_tum_trajectory


class TestUndistort:
    def test_pinhole_passthrough(self, tmp_path):
        calib = tmp_path / "camera.txt"
        calib.write_text("Pinhole 500 500 320 240 0\n640 480\nnone\n640 480\n")
        u = Undistorter.from_file(str(calib))
        assert u.passthrough
        img = np.random.default_rng(0).uniform(0, 255, (480, 640)).astype(np.float32)
        np.testing.assert_allclose(u.undistort_image(img), img)

    def test_relative_calibration_scaling(self, tmp_path):
        calib = tmp_path / "camera.txt"
        # TUM-monoVO style relative FOV calibration
        calib.write_text("0.5 0.8 0.5 0.5 0.9\n640 480\ncrop\n480 320\n")
        u = Undistorter.from_file(str(calib))
        assert u.model == "FOV"
        assert u.in_params[0] == 0.5 * 640
        assert u.w == 480 and u.h == 320
        assert np.isfinite(u.K).all()

    def test_fov_undistort_straightens(self, tmp_path):
        # a FOV-distorted image of a vertical line becomes straight
        calib = tmp_path / "camera.txt"
        calib.write_text("FOV 300 300 320 240 0.9\n640 480\ncrop\n640 480\n")
        u = Undistorter.from_file(str(calib))
        # remap must stay inside input bounds where valid
        valid = ~u._bad
        assert valid.mean() > 0.9
        assert (u.remap_x[valid] >= 0).all() and (u.remap_x[valid] <= 639).all()

    def test_radtan_model_parses(self, tmp_path):
        calib = tmp_path / "c.txt"
        calib.write_text(
            "RadTan 458.654 457.296 367.215 248.375 -0.28 0.07 0.0002 1.76e-05\n"
            "752 480\ncrop\n640 480\n"
        )
        u = Undistorter.from_file(str(calib))
        assert u.model == "RadTan"
        assert np.isfinite(u.K).all()

    def test_nearest_mask_resize_keeps_labels(self, tmp_path):
        calib = tmp_path / "camera.txt"
        calib.write_text("Pinhole 500 500 320 240 0\n640 480\nnone\n640 480\n")
        u = Undistorter.from_file(str(calib))
        mask = np.zeros((960, 1280), np.uint8)
        mask[:480] = 7
        mask[480:] = 99
        out = u.resize_nearest(mask)
        assert set(np.unique(out)) == {7, 99}


class TestPhotometric:
    def test_gamma_parse_and_apply(self, tmp_path):
        g = tmp_path / "pcalib.txt"
        # quadratic response sampled at 256 points
        xs = np.linspace(0, 1, 256)
        g.write_text(" ".join(f"{v:.6f}" for v in xs**2))
        p = PhotometricUndistorter(str(g), None, 4, 4, photometric_mode=1)
        img = np.full((4, 4), 128, np.uint8)
        out, _ = p.process(img)
        expected = 255.0 * (128 / 255.0) ** 2
        np.testing.assert_allclose(out, expected, atol=1.0)

    def test_gamma_grad_lut(self):
        gc = GammaCalib()
        np.testing.assert_allclose(gc.B_grad, 1.0, atol=1e-5)

    def test_nonmonotonic_rejected(self, tmp_path):
        g = tmp_path / "pcalib.txt"
        vals = np.linspace(0, 1, 256)
        vals[100] = vals[99]
        g.write_text(" ".join(map(str, vals)))
        with pytest.raises(ValueError):
            PhotometricUndistorter(str(g), None, 4, 4)


class TestResults:
    def test_pcd_roundtrip(self, tmp_path, rng):
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        path = str(tmp_path / "out.pcd")
        write_pcd(path, xyz)
        back = read_pcd(path)
        np.testing.assert_allclose(back, xyz, atol=1e-4)

    def test_tum_format(self, tmp_path):
        path = str(tmp_path / "result.txt")
        write_tum_trajectory(path, [(0.0, 1, 2, 3, 0, 0, 0, 1)])
        line = open(path).read().split()
        assert len(line) == 8


def test_benchmark_noise_injection(tmp_path):
    """Per-frame geometric noise (reference Undistort.cpp:452-495): the
    noise field is resampled each frame, so two undistortions of the same
    image differ; the shift magnitude is bounded by the amplitude."""
    from nalo_slam_tpu.io.undistort import Undistorter

    calib = tmp_path / "camera.txt"
    calib.write_text("FOV 300 300 320 240 0.5\n640 480\ncrop\n640 480\n")
    u = Undistorter.from_file(str(calib))
    rx0 = u.remap_x.copy()
    u.set_benchmark_noise(2.0)
    rx1, ry1 = u._noisy_remap()
    rx2, ry2 = u._noisy_remap()
    # interior crop: near the border the -1 invalid sentinel blends into
    # the re-lookup (the reference has the same hazard and just zeroes
    # negative lookups)
    interior = np.zeros_like(u._bad)
    interior[40:-40, 40:-40] = ~u._bad[40:-40, 40:-40]
    # perturbed, but bounded: |interp(remap, x+dx) - remap(x)| <= amplitude
    # times the local remap-table gradient
    delta = np.abs(rx1[interior] - rx0[interior])
    assert delta.mean() > 0.1
    assert np.median(delta) <= 2.0 * 1.5
    # fresh noise each frame
    assert np.abs(rx1[interior] - rx2[interior]).mean() > 0.05
    # end-to-end: undistorted images differ between frames
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    a = u.undistort_image(img)
    b = u.undistort_image(img)
    assert np.abs(a - b).mean() > 0.1


def test_benchmark_resize_hooks(tmp_path):
    """benchmarkSetting_width/height/fxfyfac (reference settings.cpp:
    180-186, Undistort.cpp:892-917, 952-957)."""
    from nalo_slam_tpu.io.undistort import Undistorter

    calib = tmp_path / "camera.txt"
    calib.write_text("FOV 300 300 320 240 0.5\n640 480\ncrop\n640 480\n")
    u = Undistorter.from_file(str(calib), benchmark_width=320,
                              benchmark_height=240)
    assert (u.w, u.h) == (320, 240)
    assert u.remap_x.shape == (240, 320)
    base = Undistorter.from_file(str(calib))
    u2 = Undistorter.from_file(str(calib), benchmark_fxfyfac=1e6)
    assert u2.K[0, 0] == 1e6 and u2.K[1, 1] == 1e6
    assert base.K[0, 0] < 1e6
    # 'none' mode flips to crop when the resolution is overridden
    calib2 = tmp_path / "camera2.txt"
    calib2.write_text("Pinhole 300 300 320 240 0\n640 480\nnone\n640 480\n")
    u3 = Undistorter.from_file(str(calib2), benchmark_width=320,
                               benchmark_height=240)
    assert (u3.w, u3.h) == (320, 240)
    assert not u3.passthrough
