"""BTS live 3D demo: stream images through the Flax BTS depth net and view
the unprojected point cloud live in the web viewer.

TPU-native rebuild of the reference's Qt/OpenGL webcam demo
(/root/reference/mp_mask/pytorch/bts_live_3d.py: model -> depth ->
unproject -> GL point cloud).  This environment has no webcam or Qt; the
input is a folder of images (or synthetic frames with --demo), the
renderer is the same self-contained WebGL viewer the SLAM system uses
(nalo_slam_tpu/io/live_viewer.py).

Usage:
  python tools/bts_live_3d.py --demo                 # synthetic frames
  python tools/bts_live_3d.py --images DIR [--ckpt CKPT] [--fx 707]
"""

from __future__ import annotations

import argparse
import glob
import os as _os
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def unproject(depth: np.ndarray, gray: np.ndarray, fx, fy, cx, cy,
              stride: int = 4):
    """Depth map -> camera-frame points (+ intensity), like the reference's
    vertex grid (bts_live_3d.py GL vertex buffer), strided for display."""
    h, w = depth.shape
    vv, uu = np.meshgrid(np.arange(0, h, stride), np.arange(0, w, stride),
                         indexing="ij")
    z = depth[vv, uu]
    ok = np.isfinite(z) & (z > 1e-3)
    x = (uu - cx) / fx * z
    y = (vv - cy) / fy * z
    return (np.stack([x[ok], y[ok], z[ok]], -1).astype(np.float32),
            gray[vv, uu][ok])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=str, default=None)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--demo", action="store_true",
                    help="synthetic ground+wall frames, untrained tiny net")
    ap.add_argument("--port", type=int, default=8766)
    ap.add_argument("--fx", type=float, default=707.0)
    ap.add_argument("--fy", type=float, default=707.0)
    ap.add_argument("--fps", type=float, default=4.0)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--n", type=int, default=0, help="stop after N frames")
    args = ap.parse_args()

    from nalo_slam_tpu.io.live_viewer import LiveViewer
    from nalo_slam_tpu.mpmask.bts import BtsConfig
    from nalo_slam_tpu.mpmask.infer import MaskPredictor, load_checkpoint

    if args.demo:
        from nalo_slam_tpu.utils.synthetic import GroundWallScene, default_calib
        from nalo_slam_tpu.geometry import SE3

        calib = default_calib(320, 240)
        scene = GroundWallScene(calib, y0=1.5, z_wall=8.0)
        frames = []
        for k in range(args.n or 40):
            xi = np.array([0.05 * k, 0.0, 0.03 * k, 0, 0.002 * k, 0])
            img, idep, _ = scene.render(SE3.exp(xi))
            frames.append(np.asarray(img))
        fx = fy = float(calib.fx[0])
    else:
        paths = sorted(glob.glob(_os.path.join(args.images, "*")))
        if args.n:
            paths = paths[: args.n]
        import cv2
        frames = [cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32)
                  for p in paths]
        fx, fy = args.fx, args.fy

    h, w = frames[0].shape[:2]
    cx, cy = (w - 1) / 2, (h - 1) / 2
    if args.ckpt:
        variables = load_checkpoint(args.ckpt)
        pred = MaskPredictor(BtsConfig(), variables)
    else:
        pred = MaskPredictor.init(BtsConfig.tiny(), (h, w))
        if not args.demo:
            print("WARNING: no --ckpt; depths come from an untrained net")

    lv = LiveViewer(port=args.port, max_points_per_kf=20000)
    print(f"live viewer: {lv.url}")
    pose = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)  # static camera
    try:
        for k, img in enumerate(frames):
            t0 = time.perf_counter()
            depth = pred.predict_depth(img)
            xyz, gray = unproject(depth, img, fx, fy, cx, cy, args.stride)
            lv.publish_cloud(k % 4, pose, xyz, gray)
            dt = time.perf_counter() - t0
            print(f"frame {k}: {len(xyz)} pts, {1000 * dt:.0f} ms", flush=True)
            time.sleep(max(0.0, 1.0 / args.fps - dt))
        if args.n == 0 and not args.demo:
            time.sleep(3600)   # keep serving
    finally:
        lv.join()


if __name__ == "__main__":
    main()
