"""MP-mask end-to-end: synthetic-LiDAR labels -> train -> eval -> SLAM.

The full offline-learning loop of the reference (mp_mask/README.md:110-122
make_mask LiDAR projection -> bts_my.py training -> bts_test_my.py
inference -> masks= SLAM input), run on synthetic data this environment
can generate:

  1. render a GroundWallScene sequence; synthesize a LiDAR scan by
     sampling the true depth on a sparse scan-line pattern, back-project
     to 3D, and re-project with mpmask.data.project_lidar_to_image (the
     make_mask equivalent) -> sparse depth-label PNGs;
  2. make_sample_list + train the Flax BTS (tiny or full config) with the
     mesh-sharded trainer (train_main) to a converging silog curve
     (jsonl committed as evidence);
  3. evaluate the checkpoint against the DENSE ground-truth depth with
     the reference's metric set (evaluate.compute_errors);
  4. run ONE SLAM pass where the net generates the mask prior on device
     (FullSystem.set_mask_predictor) instead of reading PNGs, and report
     the ATE.

Usage: python tools/mpmask_e2e.py [out=/tmp/mpmask_e2e] [frames=48]
         [h=128] [w=192] [steps=300] [slam_frames=18] [scan_lines=24]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2  # noqa: E402


def synth_lidar_depth(idepth: np.ndarray, K: np.ndarray, w: int, h: int,
                      scan_lines: int, jitter, rng) -> np.ndarray:
    """True depth -> synthetic LiDAR scan -> sparse projected label.

    Samples the render's depth on `scan_lines` horizontal scan rows
    (vertical jitter per column, like a spinning LiDAR's elevation
    rings), back-projects to camera-frame 3D, then runs the real
    projection path (z-buffer and all)."""
    from nalo_slam_tpu.mpmask.data import project_lidar_to_image

    depth = np.where(idepth > 1e-6, 1.0 / np.maximum(idepth, 1e-6), 0.0)
    us, vs = [], []
    for r in np.linspace(4, h - 5, scan_lines):
        cols = np.arange(0, w, 2)
        rows = np.clip(r + rng.integers(-jitter, jitter + 1, len(cols)),
                       0, h - 1).astype(int)
        us.append(cols)
        vs.append(rows)
    u = np.concatenate(us)
    v = np.concatenate(vs)
    z = depth[v, u]
    ok = z > 0.1
    u, v, z = u[ok], v[ok], z[ok]
    x = (u - K[0, 2]) / K[0, 0] * z
    y = (v - K[1, 2]) / K[1, 1] * z
    pts = np.stack([x, y, z], 1).astype(np.float32)
    return project_lidar_to_image(pts, np.eye(4), K, w, h)


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out = kv.get("out", "/tmp/mpmask_e2e")
    frames = int(kv.get("frames", 48))
    h, w = int(kv.get("h", 128)), int(kv.get("w", 192))
    steps = int(kv.get("steps", 300))
    slam_frames = int(kv.get("slam_frames", 18))
    scan_lines = int(kv.get("scan_lines", 24))
    tiny = kv.get("tiny", "1") != "0"

    from nalo_slam_tpu.geometry import SE3, PyramidCalib
    from nalo_slam_tpu.mpmask.data import make_sample_list, save_depth_png
    from nalo_slam_tpu.utils.synthetic import GroundWallScene

    os.makedirs(f"{out}/images", exist_ok=True)
    os.makedirs(f"{out}/gt", exist_ok=True)
    calib = PyramidCalib.make(w, h, 0.55 * w, 0.55 * w,
                              (w - 1) / 2, (h - 1) / 2)
    K = np.array([[calib.fx[0], 0, calib.cx[0]],
                  [0, calib.fy[0], calib.cy[0]], [0, 0, 1.0]])
    scene = GroundWallScene(calib, y0=1.5, z_wall=14.0)
    rng = np.random.default_rng(11)
    dense_gt = {}
    for k in range(frames):
        xi = np.array([0.12 * np.sin(0.21 * k) + 0.02 * k,
                       0.02 * np.sin(0.33 * k), 0.05 * k,
                       0.004 * np.sin(0.17 * k), 0.006 * np.sin(0.13 * k),
                       0.0])
        img, idep, _m = scene.render(SE3.exp(xi))
        img8 = np.clip(img + rng.normal(scale=1.0, size=img.shape),
                       0, 255).astype(np.uint8)
        cv2.imwrite(f"{out}/images/{k:06d}.png",
                    cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR))
        sparse = synth_lidar_depth(np.asarray(idep), K, w, h,
                                   scan_lines, 1, rng)
        save_depth_png(f"{out}/gt/{k:06d}.png", sparse)
        dense_gt[k] = np.where(idep > 1e-6, 1.0 / np.maximum(idep, 1e-6),
                               0.0)
    n = make_sample_list(f"{out}/images", f"{out}/gt",
                         f"{out}/train_files.txt", focal=calib.fx[0])
    print(f"dataset: {n} samples at {w}x{h}")

    # ---- train ------------------------------------------------------
    from nalo_slam_tpu.mpmask.train_main import main as train_cli
    log = f"{out}/train_log.jsonl"
    if os.path.exists(log):
        os.remove(log)
    args = ["--list", f"{out}/train_files.txt", "--data-root", out,
            "--batch", "4", "--steps", str(steps), "--lr", "3e-4",
            "--ckpt", f"{out}/ckpt", "--ckpt-every", str(steps),
            "--crop-h", str(h), "--crop-w", str(w), "--log", log]
    if tiny:
        args.append("--tiny")
    train_cli(args)
    curve = [json.loads(l) for l in open(log)]
    first, last = curve[0]["silog"], curve[-1]["silog"]
    print(f"silog: {first:.3f} -> {last:.3f} over {steps} steps")

    # ---- eval vs DENSE gt ------------------------------------------
    from nalo_slam_tpu.mpmask.bts import BtsConfig
    from nalo_slam_tpu.mpmask.evaluate import compute_errors
    from nalo_slam_tpu.mpmask.infer import MaskPredictor, load_checkpoint

    cfg = BtsConfig.tiny() if tiny else BtsConfig()
    restored = load_checkpoint(f"{out}/ckpt", steps)
    pred = MaskPredictor(cfg, {"params": restored["params"],
                               "batch_stats": restored["batch_stats"]})
    errs = []
    for k in range(0, frames, 8):   # held-out-ish subsample
        img = cv2.imread(f"{out}/images/{k:06d}.png",
                         cv2.IMREAD_GRAYSCALE).astype(np.float32)
        d = pred.predict_depth(img)
        gt = dense_gt[k]
        m = (gt > 0.5) & (gt < cfg.max_depth)
        errs.append(compute_errors(gt[m], np.clip(d[m], 0.5, cfg.max_depth)))
    ev = {k2: round(float(np.mean([e[k2] for e in errs])), 4)
          for k2 in errs[0]}
    print("eval vs dense gt:", ev)

    # ---- SLAM with the net as the online mask source ----------------
    from nalo_slam_tpu.config import Settings
    from nalo_slam_tpu.system import FullSystem
    from nalo_slam_tpu.utils.evaluate import ate_rmse

    s = Settings(max_window_frames=8, max_points=2048,
                 max_immature_per_frame=1024,
                 desired_point_density=600.0, desired_immature_density=450.0,
                 use_lidar=True, dense_track=False, plane_optimize=False)
    slam_calib = PyramidCalib.make(320, 240, 260.0, 260.0, 159.5, 119.5)
    slam_scene = GroundWallScene(slam_calib, y0=1.5, z_wall=8.0)
    sys_ = FullSystem(s, slam_calib)
    sys_.set_mask_predictor(pred)
    gt_t = []
    for k in range(slam_frames):
        xi = np.array([0.06 * k, 0.005 * np.sin(0.3 * k), 0.04 * k,
                       0, 0.003 * np.sin(0.2 * k), 0])
        T = SE3.exp(xi)
        gt_t.append(T.t.copy())
        img, _i, _m = slam_scene.render(T)
        img = np.clip(img + rng.normal(scale=1.2, size=img.shape), 0, 255)
        sys_.add_frame(img.astype(np.float32), exposure=1.0,
                       timestamp=0.1 * k, incoming_id=k)
        if sys_.is_lost:
            break
    rows = np.array(sys_.trajectory())
    ids = np.round(rows[:, 0] * 10).astype(int)
    ate = ate_rmse(rows[:, 1:4], np.array(gt_t)[ids], with_scale=True)
    print(f"SLAM with net-predicted masks: {len(rows)} poses, "
          f"ATE sim3 {ate:.4f} m")

    report = dict(samples=n, hw=[h, w], steps=steps,
                  silog_first=first, silog_last=last, eval=ev,
                  slam_poses=len(rows), slam_ate_m=round(float(ate), 5))
    with open(f"{out}/report.json", "w") as f:
        json.dump(report, f, indent=1)
    print("report ->", f"{out}/report.json")
    return report


if __name__ == "__main__":
    main(sys.argv[1:])
