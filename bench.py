"""Benchmark: tracked frames/sec of the full SLAM pipeline on synthetic
data (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline is measured against the 30 fps real-time north-star
(BASELINE.md: >=30 fps tracking on one v5e chip).

Honest accounting (reference fps report: src/main_dso_pangolin.cpp:638-649):
* the track||map pipeline is ON (the reference's two-thread mode);
* fps is end-to-end wall time over the steady-state window INCLUDING
  keyframes and the final queue drain -- nothing is trimmed;
* the keyframe cost is reported separately (kf_ms = whole mapping-side
  makeKeyFrame, kf_ba_ms = the window-BA stage), matching the BASELINE
  "KF-BA ms" metric;
* a second pass runs the full NALO mode (mask prior + dense frontend +
  plane optimize) on the ground+wall scene -> nalo_fps.
"""

from __future__ import annotations

import json
import os as _os
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/nalo_jax_cache_" + _os.environ.get("JAX_PLATFORMS", "axon").split(",")[0],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _settings(**kw):
    from nalo_slam_tpu.config import Settings

    return Settings(
        max_window_frames=8,
        max_points=2048,
        max_immature_per_frame=1024,
        desired_point_density=800.0,
        desired_immature_density=600.0,
        **kw,
    )


def _run(settings, calib, frames, masks=None, warmup=20):
    """Feed frames through the pipelined system; return (fps, metrics)."""
    from nalo_slam_tpu.system import FullSystem
    from nalo_slam_tpu.system.pipeline import PipelinedSystem

    sys_ = FullSystem(settings, calib)
    sys_.precompile()   # front-load compiles/cache-loads out of the run
    pipe = PipelinedSystem(sys_)
    t_steady = None
    n_fed = 0
    for k, img in enumerate(frames):
        if k == warmup:
            t_steady = time.perf_counter()
        pipe.add_frame(img, exposure=1.0, timestamp=float(k), incoming_id=k,
                       mask=masks[k] if masks is not None else None)
        if sys_.is_lost:
            break
        n_fed = k + 1
    pipe.finish()
    t_end = time.perf_counter()
    n_steady = n_fed - warmup
    fps = n_steady / (t_end - t_steady) if (t_steady and n_steady > 0) else 0.0
    return fps, sys_.metrics


def main():
    from nalo_slam_tpu.geometry import SE3, PyramidCalib
    from nalo_slam_tpu.utils.synthetic import GroundWallScene, PlaneScene

    w, h = 320, 240
    calib = PyramidCalib.make(w, h, 260.0, 260.0, (w - 1) / 2, (h - 1) / 2)
    rng = np.random.default_rng(7)

    # --- pass 1: sparse DSO mode (reference FAST-preset-class workload) ---
    scene = PlaneScene(calib, z0=4.0)
    frames = []
    for k in range(60):
        xi = np.array([0.05 * k, 0.008 * np.sin(0.2 * k), 0.01 * k,
                       0.0, 0.002 * np.sin(0.11 * k), 0.0])
        img, _ = scene.render(SE3.exp(xi))
        # sensor noise keeps residual statistics realistic (a noiseless
        # render trips the re-track ladder constantly)
        frames.append(img + rng.normal(scale=1.5, size=img.shape).astype(np.float32))
    # the tunneled link's round-trip latency drifts minute-to-minute; run
    # the (untrimmed) measurement three times and report the MEDIAN pass
    # with the full spread in the record -- each pass is a full honest run
    # (pipelined, KFs + drain included, nothing trimmed within a pass)
    runs = []
    for _ in range(3):
        fps, metrics = _run(
            _settings(use_lidar=False, dense_track=False, plane_optimize=False),
            calib, frames,
        )
        runs.append((fps, metrics))
    fps_runs = sorted(round(f, 2) for f, _ in runs)
    fps, metrics = sorted(runs, key=lambda r: r[0])[len(runs) // 2]
    summ = metrics.summary()
    kf_stage = summ.get("kf_stage_ms_median", {})
    kf_ms = kf_stage.get("total", 0.0)
    kf_ba_ms = kf_stage.get("optimize", 0.0)

    # --- pass 2: full NALO mode (mask prior + dense frontend + plane) ---
    gscene = GroundWallScene(calib, y0=1.5, z_wall=8.0)
    gframes, gmasks = [], []
    for k in range(40):
        xi = np.array([0.06 * k, 0.005 * np.sin(0.3 * k), 0.04 * k,
                       0.0, 0.003 * np.sin(0.2 * k), 0.0])
        img, _, mask = gscene.render(SE3.exp(xi))
        gframes.append(img + rng.normal(scale=1.2, size=img.shape).astype(np.float32))
        gmasks.append(mask)
    try:
        nalo_fps, _ = _run(
            _settings(use_lidar=True, dense_track=True, plane_optimize=True),
            calib, gframes, masks=gmasks, warmup=15,
        )
    except Exception:
        nalo_fps = 0.0

    # --- pass 3: preset-0 operating point (P=16384, M=4096, densities
    # 5000/4000 -- the reference's default NALO design point) ---
    try:
        from nalo_slam_tpu.config import Settings, preset as _preset

        s0 = _preset(0, Settings()).replace(
            use_lidar=False, dense_track=False, plane_optimize=False)
        p0_fps, p0_metrics = _run(s0, calib, frames, warmup=20)
        p0_stage = p0_metrics.summary().get("kf_stage_ms_median", {})
        p0_kf_ms = p0_stage.get("total", 0.0)
        p0_kf_ba_ms = p0_stage.get("optimize", 0.0)
    except Exception:
        p0_fps, p0_kf_ms, p0_kf_ba_ms = 0.0, 0.0, 0.0

    # --- pass 4: KITTI-class operating point (1224x368, preset-0
    # densities -- the BASELINE.md north-star workload shape) ---
    try:
        kw, kh = 1224, 368
        kcalib = PyramidCalib.make(kw, kh, 707.0, 707.0,
                                   (kw - 1) / 2, (kh - 1) / 2)
        kscene = PlaneScene(kcalib, z0=6.0)
        kframes = []
        for k in range(40):
            # ~5 px/frame flow at f=707, z0=6 -- same optical-flow regime
            # as the 320x240 pass (faster synthetic motion loses tracking
            # on this scene; throughput is what this pass measures)
            xi = np.array([0.04 * k, 0.01 * np.sin(0.2 * k), 0.03 * k,
                           0.0, 0.002 * np.sin(0.11 * k), 0.0])
            img, _ = kscene.render(SE3.exp(xi))
            kframes.append(
                img + rng.normal(scale=1.5, size=img.shape).astype(np.float32))
        kt_fps, kt_metrics = _run(s0, kcalib, kframes, warmup=15)
        kt_stage = kt_metrics.summary().get("kf_stage_ms_median", {})
        kt_kf_ms = kt_stage.get("total", 0.0)
        kt_kf_ba_ms = kt_stage.get("optimize", 0.0)
    except Exception:
        kt_fps, kt_kf_ms, kt_kf_ba_ms = 0.0, 0.0, 0.0

    print(json.dumps({
        "metric": "tracked_fps_synthetic_320x240",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
        "kf_ms": round(kf_ms, 1),
        "kf_ba_ms": round(kf_ba_ms, 1),
        "nalo_fps": round(nalo_fps, 2),
        "fps_runs": fps_runs,
        "preset0_fps": round(p0_fps, 2),
        "preset0_kf_ms": round(p0_kf_ms, 1),
        "preset0_kf_ba_ms": round(p0_kf_ba_ms, 1),
        "kitti_class_fps": round(kt_fps, 2),
        "kitti_class_kf_ms": round(kt_kf_ms, 1),
        "kitti_class_kf_ba_ms": round(kt_kf_ba_ms, 1),
    }))


if __name__ == "__main__":
    main()
