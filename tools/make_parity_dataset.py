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
from nalo_slam_tpu.utils.synthetic import (GroundWallScene, MultiPlaneScene,  # noqa: E402
                                           default_calib)


def make(outdir="/tmp/pds", frames=350, w=320, h=240, seed=3,
         amp_a=0.08, amp_b=3.0, noise=1.2, gamma=0.0, vignette=0,
         scene="groundwall"):
    """gamma>0 / vignette=1 emit a photometrically-distorted sequence plus
    the calibration files that undo it (pcalib.txt response samples +
    16-bit vignette.png), exercising the reference's mode=0 path
    (src/util/Undistort.cpp:47-254): the sensor model is
    raw = G_resp(B * V) with G_resp(x) = 255*(x/255)**gamma, so the
    pcalib file stores G_resp^-1 sampled on the 256 raw levels."""
    os.makedirs(f"{outdir}/images", exist_ok=True)
    os.makedirs(f"{outdir}/masks", exist_ok=True)
    # the reference reads a color image for every frame unconditionally
    # (DatasetReader.h:305); 3-channel copies of the gray render suffice
    os.makedirs(f"{outdir}/colors", exist_ok=True)
    calib = default_calib(w, h)
    multi = scene == "multi"
    # corridor: side walls at +-6 are visible from the start (a wall at
    # lateral distance d enters the frustum at depth ~d/tan(halfFOV)
    # ~= 1.56 d ~= 9.4, inside the 60-deep corridor); the trajectory
    # below keeps the camera within +-2 of the centerline
    scene = (MultiPlaneScene(calib, y0=1.5, z_wall=60.0, x_wall=6.0)
             if multi else
             GroundWallScene(calib, y0=1.5, z_wall=30.0))
    rng = np.random.default_rng(seed)
    vmap_f = None
    if vignette:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        r2 = (((xx - w / 2) / (w / 2)) ** 2 + ((yy - h / 2) / (h / 2)) ** 2) / 2
        vmap_f = 1.0 - 0.45 * r2  # smooth radial falloff, min ~0.55
        cv2.imwrite(f"{outdir}/vignette.png",
                    (vmap_f * 65535.0 / vmap_f.max()).astype(np.uint16))
    if gamma > 0 or vignette:
        # pcalib: irradiance at each raw level, i.e. G_resp^-1 (strictly
        # increasing, normalized by the reader).  With vignette-only
        # distortion (gamma==0) emit the identity ramp: the reference's
        # mode=0 exits without a valid response file
        # (main_dso_pangolin.cpp:467) and its PhotometricUndistorter
        # ignores the vignette unless the pcalib parsed.
        lv = np.arange(256, dtype=np.float64)
        g_eff = gamma if gamma > 0 else 1.0
        inv = 255.0 * (lv / 255.0) ** (1.0 / g_eff)
        inv[0] = 0.0
        inv = np.maximum.accumulate(inv + 1e-4 * lv)  # strict monotonicity
        with open(f"{outdir}/pcalib.txt", "w") as f:
            f.write(" ".join(f"{v:.6f}" for v in inv) + "\n")
    poses = []
    for k in range(frames):
        if multi:
            # down-the-corridor drive: gentle slalom between the side
            # walls, forward 0.1/frame (KITTI-like), slight bob/yaw
            xi = np.array(
                [
                    2.0 * np.sin(0.05 * k),          # lateral slalom (+-2)
                    0.02 * np.sin(0.11 * k),         # small vertical bob
                    0.1 * k,                         # forward drive
                    0.004 * np.sin(0.07 * k),        # pitch wiggle
                    0.006 * np.sin(0.045 * k),       # yaw wiggle
                    0.002 * np.sin(0.09 * k),        # roll wiggle
                ]
            )
        else:
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
        if vignette or gamma > 0:
            img = np.clip(img, 0, 255)
            if vignette:
                img = img * vmap_f
            if gamma > 0:
                img = 255.0 * (np.maximum(img, 0.0) / 255.0) ** gamma
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
         w=int(kv.get("w", "320")), h=int(kv.get("h", "240")),
         amp_a=float(kv.get("amp_a", "0.08")), amp_b=float(kv.get("amp_b", "3.0")),
         noise=float(kv.get("noise", "1.2")), gamma=float(kv.get("gamma", "0")),
         vignette=int(kv.get("vignette", "0")),
         scene=kv.get("scene", "groundwall"))
