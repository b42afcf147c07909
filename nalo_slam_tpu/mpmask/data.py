"""MP-mask training data pipeline.

Rebuild of mp_mask/pytorch/my_dataloader.py: filename-list driven
image + depth-PNG pairs, KITTI-style crop (1216x352 bottom crop,
my_dataloader.py:92-98), random crop/flip augmentation and ImageNet
normalization (:195-213).  Depth PNGs store depth*256 as 16-bit
(KITTI convention, bts_test_my.py:160-169).

Also provides the LiDAR->label generation the reference delegates to its
absent ROS `make_mask` package (bin2pcd + project2img, README.md:110-122):
project a LiDAR point cloud into the camera to produce the depth/mask
label image.
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_depth_png(path: str) -> np.ndarray:
    """16-bit PNG with depth*256 -> float32 meters."""
    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if d is None:
        raise FileNotFoundError(path)
    return d.astype(np.float32) / 256.0


def save_depth_png(path: str, depth: np.ndarray):
    cv2.imwrite(path, (np.clip(depth, 0, 255) * 256.0).astype(np.uint16))


def kitti_crop(img: np.ndarray, h: int = 352, w: int = 1216):
    """Bottom-center crop (my_dataloader.py:92-98)."""
    H, W = img.shape[:2]
    top = H - h
    left = (W - w) // 2
    return img[top : top + h, left : left + w]


def normalize(img_rgb: np.ndarray) -> np.ndarray:
    return (img_rgb.astype(np.float32) / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD


def make_sample_list(img_dir: str, gt_dir: str, out_file: str,
                     focal: float | None = None,
                     relative_to: str | None = None) -> int:
    """Pair sorted images with sorted label PNGs into a sample list.

    Rebuild of mp_mask/pytorch/file_path_io.py: one 'image gt [focal]'
    line per frame, consumable by MaskDataset.  Counts must match; pairs
    are by sort order (the reference pairs i-th with i-th).  Returns the
    number of lines written.
    """
    exts = (".png", ".jpg", ".jpeg")
    imgs = sorted(f for f in os.listdir(img_dir)
                  if f.lower().endswith(exts))
    gts = sorted(f for f in os.listdir(gt_dir)
                 if f.lower().endswith(exts))
    if len(imgs) != len(gts):
        raise ValueError(
            f"{img_dir}: {len(imgs)} images vs {gt_dir}: {len(gts)} labels")
    def rel(p):
        return os.path.relpath(p, relative_to) if relative_to else p
    os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
    with open(out_file, "w") as f:
        for a, b in zip(imgs, gts):
            line = f"{rel(os.path.join(img_dir, a))} {rel(os.path.join(gt_dir, b))}"
            if focal is not None:
                line += f" {focal}"
            f.write(line + "\n")
    return len(imgs)


class MaskDataset:
    """Filename-list dataset: each line 'image_rel depth_rel [focal]'."""

    def __init__(self, list_file: str, data_root: str, gt_root: str | None = None,
                 crop_hw=(352, 1216), train: bool = True, seed: int = 0):
        self.rows = []
        with open(list_file) as f:
            for line in f:
                toks = line.split()
                if len(toks) >= 2:
                    self.rows.append((toks[0], toks[1]))
        self.data_root = data_root
        self.gt_root = gt_root or data_root
        self.crop_hw = crop_hw
        self.train = train
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        img_rel, gt_rel = self.rows[i]
        img = cv2.imread(os.path.join(self.data_root, img_rel), cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        depth = load_depth_png(os.path.join(self.gt_root, gt_rel))
        h, w = self.crop_hw
        img = kitti_crop(img, h, w)
        depth = kitti_crop(depth, h, w)
        if self.train and self.rng.random() < 0.5:  # horizontal flip
            img = img[:, ::-1]
            depth = depth[:, ::-1]
        return normalize(img), depth.astype(np.float32)

    def batches(self, batch_size: int, shuffle: bool = True):
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(j)] for j in order[s : s + batch_size]]
            imgs = np.stack([a for a, _ in items])
            gts = np.stack([b for _, b in items])
            yield imgs, gts


# ---------------------------------------------------------------------------
# LiDAR -> label generation (replaces the absent make_mask ROS package)
# ---------------------------------------------------------------------------


def load_kitti_bin(path: str) -> np.ndarray:
    """KITTI velodyne .bin -> (N, 4) [x y z reflectance]."""
    return np.fromfile(path, np.float32).reshape(-1, 4)


def project_lidar_to_image(points_xyz: np.ndarray, T_cam_lidar: np.ndarray,
                           K: np.ndarray, w: int, h: int) -> np.ndarray:
    """Project LiDAR points into the camera; nearest-depth z-buffer per
    pixel.  Returns the depth image (0 where no return) -- the 'mask'
    prior image consumed by the SLAM frontend."""
    pts = points_xyz[:, :3] @ T_cam_lidar[:3, :3].T + T_cam_lidar[:3, 3]
    z = pts[:, 2]
    ok = z > 0.1
    pts = pts[ok]
    z = z[ok]
    u = (K[0, 0] * pts[:, 0] / z + K[0, 2]).astype(int)
    v = (K[1, 1] * pts[:, 1] / z + K[1, 2]).astype(int)
    inb = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u, v, z = u[inb], v[inb], z[inb]
    depth = np.full((h, w), np.inf, np.float32)
    # z-buffer: keep the nearest return per pixel
    order = np.argsort(-z)  # far first so near overwrites
    depth[v[order], u[order]] = z[order]
    depth[~np.isfinite(depth)] = 0.0
    return depth


def depth_to_mask(depth: np.ndarray, max_depth: float = 80.0) -> np.ndarray:
    """Scale a depth/label image into the 0..255 'mask' range the SLAM
    selector consumes (near geometry = high value)."""
    m = np.zeros_like(depth)
    has = depth > 0
    m[has] = np.clip(255.0 * (1.0 - depth[has] / max_depth), 1, 255)
    return m


if __name__ == "__main__":  # file_path_io.py CLI analog
    import sys as _sys
    if len(_sys.argv) < 4:
        print("usage: python -m nalo_slam_tpu.mpmask.data "
              "<img_dir> <gt_dir> <out.txt> [focal]")
        raise SystemExit(2)
    _n = make_sample_list(
        _sys.argv[1], _sys.argv[2], _sys.argv[3],
        focal=float(_sys.argv[4]) if len(_sys.argv) > 4 else None)
    print(f"wrote {_n} lines to {_sys.argv[3]}")
