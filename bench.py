"""Benchmark: tracked frames/sec of the full SLAM pipeline on synthetic
data (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 30 fps real-time north-star
(BASELINE.md: >=30 fps tracking on one v5e chip).

Note: on the tunneled bench device every host<->device round trip costs
~30 ms and D2H bandwidth is ~10 MB/s, so the pipeline is engineered for
one-call-per-stage dispatch; the median steady-state frame time is the
honest figure (compile spikes excluded by the median).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax

import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/nalo_jax_cache_" + _os.environ.get("JAX_PLATFORMS", "axon").split(",")[0],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from nalo_slam_tpu.config import Settings
    from nalo_slam_tpu.geometry import SE3, PyramidCalib
    from nalo_slam_tpu.system import FullSystem
    from nalo_slam_tpu.utils.synthetic import PlaneScene

    # reference FAST-preset-class workload (424x320 in the reference)
    w, h = 320, 240
    calib = PyramidCalib.make(w, h, 260.0, 260.0, (w - 1) / 2, (h - 1) / 2)
    scene = PlaneScene(calib, z0=4.0)
    s = Settings(
        max_window_frames=8,
        max_points=2048,
        max_immature_per_frame=1024,
        desired_point_density=800.0,
        desired_immature_density=600.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )

    n_frames = 60
    frames = []
    rng = np.random.default_rng(7)
    for k in range(n_frames):
        xi = np.array([0.05 * k, 0.008 * np.sin(0.2 * k), 0.01 * k,
                       0.0, 0.002 * np.sin(0.11 * k), 0.0])
        img, _ = scene.render(SE3.exp(xi))
        # sensor noise: keeps residual statistics realistic (a noiseless
        # render makes relative residual fluctuations trigger the re-track
        # ladder constantly, which no real sequence does)
        frames.append(img + rng.normal(scale=1.5, size=img.shape).astype(np.float32))

    # sequential (linearizeOperation) mode: on a single chip the mapping
    # thread cannot overlap device compute with tracking, so async buys
    # nothing here; the pipeline mode is covered by its own test
    sys_ = FullSystem(s, calib)
    frame_times = []
    for k, img in enumerate(frames):
        t0 = time.perf_counter()
        sys_.add_frame(img, exposure=1.0, timestamp=float(k), incoming_id=k)
        frame_times.append(time.perf_counter() - t0)
        if sys_.is_lost:
            break

    # steady state: skip init/compile warmup, drop the 3 largest times
    # (one-time compiles; the persistent cache makes reruns clean) and
    # report the MEAN -- keyframes count, unlike a median that hides them
    post = sorted(t for t in frame_times[20:] if t > 0)
    post = post[: max(len(post) - 3, 1)]
    mean = float(np.mean(post)) if post else float("inf")
    fps = 1.0 / mean if mean > 0 else 0.0
    print(json.dumps({
        "metric": "tracked_fps_synthetic_320x240",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
