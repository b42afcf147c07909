import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nalo_slam_tpu.mpmask.data import (depth_to_mask, kitti_crop,
                                       load_depth_png, make_sample_list,
                                       normalize, project_lidar_to_image,
                                       save_depth_png, MaskDataset)
from nalo_slam_tpu.mpmask.bts import BtsConfig
from nalo_slam_tpu.mpmask.infer import MaskPredictor, export_depth_pngs


def test_depth_png_roundtrip(tmp_path):
    d = np.random.default_rng(0).uniform(0.5, 60, (20, 30)).astype(np.float32)
    p = str(tmp_path / "d.png")
    save_depth_png(p, d)
    back = load_depth_png(p)
    np.testing.assert_allclose(back, d, atol=1 / 256.0)


def test_kitti_crop_shape():
    img = np.zeros((375, 1242, 3))
    out = kitti_crop(img)
    assert out.shape == (352, 1216, 3)


def test_lidar_projection_zbuffer():
    # two points on the same pixel: keep the nearer
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    pts = np.array([[0, 0, 5.0, 1.0], [0, 0, 2.0, 1.0]])
    depth = project_lidar_to_image(pts, np.eye(4), K, 64, 48)
    assert depth[24, 32] == pytest.approx(2.0)
    assert (depth > 0).sum() == 1


def test_depth_to_mask_monotonic():
    d = np.array([[0.0, 1.0, 40.0, 79.0]])
    m = depth_to_mask(d)
    assert m[0, 0] == 0           # no return
    assert m[0, 1] > m[0, 2] > m[0, 3] > 0


def test_make_sample_list(tmp_path):
    """file_path_io.py analog: sorted pairing, focal column, MaskDataset
    round-trip, count-mismatch rejection."""
    rng = np.random.default_rng(1)
    (tmp_path / "images").mkdir()
    (tmp_path / "gt").mkdir()
    for k in range(3):
        img = rng.uniform(0, 255, (375, 1242, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{k:06d}.png"), img)
        save_depth_png(str(tmp_path / "gt" / f"{k:06d}.png"),
                       rng.uniform(1, 60, (375, 1242)).astype(np.float32))
    out = tmp_path / "lists" / "samples.txt"
    n = make_sample_list(str(tmp_path / "images"), str(tmp_path / "gt"),
                         str(out), focal=718.0, relative_to=str(tmp_path))
    assert n == 3
    lines = out.read_text().splitlines()
    assert len(lines) == 3
    assert lines[0].split() == ["images/000000.png", "gt/000000.png", "718.0"]
    ds = MaskDataset(str(out), str(tmp_path), train=False)
    imgs, gts = next(ds.batches(2, shuffle=False))
    assert imgs.shape == (2, 352, 1216, 3)
    # mismatched counts must be rejected
    cv2.imwrite(str(tmp_path / "images" / "extra.png"),
                np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        make_sample_list(str(tmp_path / "images"), str(tmp_path / "gt"),
                         str(out))


def test_mask_dataset_and_batches(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (375, 1242, 3))).astype(np.uint8)
    depth = rng.uniform(1, 60, (375, 1242)).astype(np.float32)
    cv2.imwrite(str(tmp_path / "img.png"), img)
    save_depth_png(str(tmp_path / "gt.png"), depth)
    lst = tmp_path / "list.txt"
    lst.write_text("img.png gt.png 718.0\n" * 4)
    ds = MaskDataset(str(lst), str(tmp_path), train=True)
    assert len(ds) == 4
    imgs, gts = next(ds.batches(2))
    assert imgs.shape == (2, 352, 1216, 3)
    assert gts.shape == (2, 352, 1216)


@pytest.mark.slow
def test_mask_predictor_end_to_end(tmp_path):
    cfg = BtsConfig.tiny()
    pred = MaskPredictor.init(cfg, (48, 64))
    img = np.random.default_rng(0).uniform(0, 255, (48, 64)).astype(np.float32)
    d = pred.predict_depth(img)
    assert d.shape == (48, 64)
    assert (d >= 0).all() and (d <= cfg.max_depth).all()
    m = pred.predict_mask(img)
    assert m.shape == (48, 64)
    paths = export_depth_pngs(pred, [img], str(tmp_path))
    assert len(paths) == 1
    back = load_depth_png(paths[0])
    np.testing.assert_allclose(back, d, atol=0.01)
