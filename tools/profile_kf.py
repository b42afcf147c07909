"""Per-stage keyframe profiling on the bench workload.

Runs the same synthetic sequence as bench.py through the sequential
FullSystem and prints the per-KF stage breakdown (host-blocking ms) that
FullSystem.metrics collects, plus frame-time statistics.

Usage: python tools/profile_kf.py [n_frames] [pipelined|sequential] [kitti]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax

import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/nalo_jax_cache_" + _os.environ.get("JAX_PLATFORMS", "axon").split(",")[0],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    from nalo_slam_tpu.config import Settings
    from nalo_slam_tpu.geometry import SE3, PyramidCalib
    from nalo_slam_tpu.system import FullSystem
    from nalo_slam_tpu.system.pipeline import PipelinedSystem
    from nalo_slam_tpu.utils.synthetic import PlaneScene

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    pipelined = len(sys.argv) > 2 and sys.argv[2] == "pipelined"
    kitti = len(sys.argv) > 3 and sys.argv[3] == "kitti"

    rng = np.random.default_rng(7)
    if kitti:
        # the BASELINE north-star workload shape: KITTI-class resolution
        # at preset-0 densities (bench.py pass 4)
        from nalo_slam_tpu.config import preset as _preset
        w, h = 1224, 368
        calib = PyramidCalib.make(w, h, 707.0, 707.0, (w - 1) / 2, (h - 1) / 2)
        scene = PlaneScene(calib, z0=6.0)
        s = _preset(0, Settings()).replace(
            use_lidar=False, dense_track=False, plane_optimize=False)
        frames = []
        for k in range(n_frames):
            xi = np.array([0.04 * k, 0.01 * np.sin(0.2 * k), 0.03 * k,
                           0.0, 0.002 * np.sin(0.11 * k), 0.0])
            img, _ = scene.render(SE3.exp(xi))
            frames.append(
                img + rng.normal(scale=1.5, size=img.shape).astype(np.float32))
    else:
        w, h = 320, 240
        calib = PyramidCalib.make(w, h, 260.0, 260.0, (w - 1) / 2, (h - 1) / 2)
        scene = PlaneScene(calib, z0=4.0)
        s = Settings(
            max_window_frames=8, max_points=2048, max_immature_per_frame=1024,
            desired_point_density=800.0, desired_immature_density=600.0,
            use_lidar=False, dense_track=False, plane_optimize=False,
        )
        frames = []
        for k in range(n_frames):
            xi = np.array([0.05 * k, 0.008 * np.sin(0.2 * k), 0.01 * k,
                           0.0, 0.002 * np.sin(0.11 * k), 0.0])
            img, _ = scene.render(SE3.exp(xi))
            frames.append(
                img + rng.normal(scale=1.5, size=img.shape).astype(np.float32))

    sys_ = FullSystem(s, calib)
    sys_.precompile()
    runner = PipelinedSystem(sys_) if pipelined else sys_
    frame_times = []
    for k, img in enumerate(frames):
        t0 = time.perf_counter()
        runner.add_frame(img, exposure=1.0, timestamp=float(k), incoming_id=k)
        frame_times.append(time.perf_counter() - t0)
        if sys_.is_lost:
            break
    if pipelined:
        runner.finish()

    summ = sys_.metrics.summary()
    post = np.array(frame_times[20:])
    print("per-frame ms:", [round(1000*t, 1) for t in frame_times])
    kf_stages = list(sys_.metrics.kf_stage_ms)
    print("KF totals ms:", [round(d.get("total", 0), 1) for d in kf_stages])
    for i, d in enumerate(kf_stages):
        print(f"  KF{i}:", {k: round(v,1) for k,v in sorted(d.items()) if v > 1})
    import collections
    agg = collections.defaultdict(list)
    for d in kf_stages:
        for k, v in d.items(): agg[k].append(v)
    print("KF stage max:", {k: round(max(v),1) for k,v in sorted(agg.items())})
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "pipelined": pipelined,
        "n_frames": len(frame_times),
        "n_keyframes": sys_.statistics["n_keyframes"],
        "steady_mean_ms": round(float(post.mean() * 1000), 1),
        "steady_median_ms": round(float(np.median(post) * 1000), 1),
        "steady_max_ms": round(float(post.max() * 1000), 1),
        "fps_plain_mean": round(1.0 / float(post.mean()), 2),
        "summary": summ,
    }, indent=2))


if __name__ == "__main__":
    main()
