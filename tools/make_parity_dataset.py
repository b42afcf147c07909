"""Generate a long on-disk synthetic sequence for reference-vs-ours parity runs.

Renders a GroundWallScene trajectory (lateral + forward slalom with slight
yaw, per-frame affine brightness changes, sensor noise) to DSO's on-disk
dataset format: images/NNNNNN.png, masks/NNNNNN.png, camera.txt, gt.npy.
Both the reference binary (tools/refbuild/build/nalo_ref) and our CLI
(python -m nalo_slam_tpu.main) read this directly.

Usage: python tools/make_parity_dataset.py [outdir=/tmp/pds] [frames=350]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2  # noqa: E402

from nalo_slam_tpu.geometry import SE3  # noqa: E402
from nalo_slam_tpu.utils.synthetic import GroundWallScene, default_calib  # noqa: E402


def make(outdir="/tmp/pds", frames=350, w=320, h=240, seed=3,
         amp_a=0.08, amp_b=3.0, noise=1.2):
    os.makedirs(f"{outdir}/images", exist_ok=True)
    os.makedirs(f"{outdir}/masks", exist_ok=True)
    # the reference reads a color image for every frame unconditionally
    # (DatasetReader.h:305); 3-channel copies of the gray render suffice
    os.makedirs(f"{outdir}/colors", exist_ok=True)
    calib = default_calib(w, h)
    scene = GroundWallScene(calib, y0=1.5, z_wall=30.0)
    rng = np.random.default_rng(seed)
    poses = []
    for k in range(frames):
        xi = np.array(
            [
                0.05 * k + 0.3 * np.sin(0.05 * k),   # lateral (init parallax)
                0.02 * np.sin(0.11 * k),             # small vertical bob
                0.03 * k,                            # slow approach to the wall
                0.004 * np.sin(0.07 * k),            # pitch wiggle
                0.006 * np.sin(0.045 * k),           # yaw wiggle
                0.002 * np.sin(0.09 * k),            # roll wiggle
            ]
        )
        T = SE3.exp(xi)
        poses.append(np.concatenate([T.t, T.log()[3:]]))
        img, _idep, mask = scene.render(T)
        # Per-frame affine brightness drift (exercises the AffLight estimate)
        a = amp_a * np.sin(0.05 * k)
        b = amp_b * np.sin(0.03 * k)
        img = np.exp(a) * img + b
        if noise > 0:
            img = img + rng.normal(scale=noise, size=img.shape)
        img = np.clip(img, 0, 255).astype(np.uint8)
        cv2.imwrite(f"{outdir}/images/{k:06d}.png", img)
        cv2.imwrite(f"{outdir}/masks/{k:06d}.png", mask.astype(np.uint8))
        cv2.imwrite(f"{outdir}/colors/{k:06d}.png", cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
    np.save(f"{outdir}/gt.npy", np.array(poses))
    # TUM-format gt (t x y z qx qy qz qw), camToWorld like DSO's result.txt
    with open(f"{outdir}/gt.txt", "w") as f:
        for k, p in enumerate(poses):
            R = SE3.exp(np.concatenate([np.zeros(3), p[3:]])).R
            qw = 0.5 * np.sqrt(max(1.0 + np.trace(R), 1e-12))
            qx = (R[2, 1] - R[1, 2]) / (4 * qw)
            qy = (R[0, 2] - R[2, 0]) / (4 * qw)
            qz = (R[1, 0] - R[0, 1]) / (4 * qw)
            f.write(f"{0.1 * k:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n")
    # times.txt (id timestamp exposure): the reference zeroes all timestamps
    # without it (DatasetReader.h:317-380), which breaks trajectory matching.
    with open(f"{outdir}/times.txt", "w") as f:
        for k in range(frames):
            f.write(f"{k:06d} {0.1 * k:.6f} 1.0\n")
    with open(f"{outdir}/camera.txt", "w") as f:
        f.write(
            f"Pinhole {calib.fx[0]} {calib.fy[0]} {calib.cx[0]} {calib.cy[0]} 0\n"
            f"{w} {h}\nnone\n{w} {h}\n"
        )
    print(f"wrote {frames} frames to {outdir}")


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    make(kv.get("outdir", "/tmp/pds"), int(kv.get("frames", "350")),
         amp_a=float(kv.get("amp_a", "0.08")), amp_b=float(kv.get("amp_b", "3.0")),
         noise=float(kv.get("noise", "1.2")))
