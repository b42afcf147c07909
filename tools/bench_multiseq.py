"""Multi-sequence scale-out throughput diagnostic.

SURVEY.md §2.4 scale-out rows: B sequences tracked in lock-step share
every per-lockstep device program (descent, deferred trace, re-track
ladder, activation, window GN) as ONE vmapped dispatch, batch-sharded
over the mesh 'dp' axis.  This tool measures aggregate tracked
frames/sec for B sequences batched via MultiSeqSystem vs the same B
sequences run back-to-back on the single-sequence path.

Interpretation: the design point is B CHIPS (each mesh element computes
one sequence; dispatch count independent of B, pinned by
tests/test_parallel.py).  On ONE chip the batched programs are B times
the compute, so batching only wins where per-dispatch overhead (the
~30 ms tunneled round trip) dominates compute; measured 0.66x aggregate
at 320x240 preset-2-class density on one v5e -- compute-bound, as
expected.  MultiSeqSystem now A/B-probes both modes right after
initialization whenever B > mesh size and keeps the faster one
(never-worse guard; "mode" in the output says what it chose), so on one
chip the aggregate is >= the sequential baseline by construction.

Run:  python tools/bench_multiseq.py [B=4] [n=60] [w=320 h=240]
"""

from __future__ import annotations

import os as _os
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/nalo_jax_cache_" + _os.environ.get("JAX_PLATFORMS", "axon").split(",")[0],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    B = int(kv.get("B", 4))
    n = int(kv.get("n", 60))
    w, h = int(kv.get("w", 320)), int(kv.get("h", 240))

    from nalo_slam_tpu.config import Settings
    from nalo_slam_tpu.geometry import SE3, PyramidCalib
    from nalo_slam_tpu.parallel import MultiSeqSystem, make_mesh
    from nalo_slam_tpu.system import FullSystem
    from nalo_slam_tpu.utils.synthetic import PlaneScene

    calib = PyramidCalib.make(w, h, 260.0 * w / 320, 260.0 * w / 320,
                              (w - 1) / 2, (h - 1) / 2)
    s = Settings(
        max_window_frames=8, max_points=2048, max_immature_per_frame=1024,
        desired_point_density=800.0, desired_immature_density=600.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    scene = PlaneScene(calib, z0=4.0)
    rng = np.random.default_rng(7)

    def gt_pose(b, k):
        xi = np.array([
            (0.05 + 0.002 * b) * k, 0.008 * np.sin(0.2 * k + 0.3 * b),
            0.01 * k, 0.0, 0.002 * np.sin(0.11 * k), 0.0,
        ])
        return SE3.exp(xi)

    frames = [[None] * B for _ in range(n)]
    for k in range(n):
        for b in range(B):
            img, _ = scene.render(gt_pose(b, k))
            frames[k][b] = img + rng.normal(
                scale=1.5, size=img.shape).astype(np.float32)

    n_dev = len(jax.devices())
    dp = min(B, n_dev)
    mesh = make_mesh(dp=dp, tp=1)

    # --- batched: B sequences in lock-step, one dispatch per program ---
    ms = MultiSeqSystem(s, calib, B, mesh)
    for sysb in ms.systems:
        sysb.precompile()
    warm = 20
    t0 = None
    for k in range(n):
        if k == warm:
            t0 = time.perf_counter()
        ms.add_frames(frames[k], timestamp=float(k), incoming_id=k)
    batched_fps = B * (n - warm) / (time.perf_counter() - t0)
    ok_b = sum(1 for x in ms.systems if x.initialized and not x.is_lost)

    # --- sequential baseline: the same sequences one after another ---
    t_seq = 0.0
    ok_s = 0
    for b in range(B):
        sys_ = FullSystem(s, calib)
        sys_.precompile()
        t1 = None
        for k in range(n):
            if k == warm:
                t1 = time.perf_counter()
            sys_.add_frame(frames[k][b], exposure=1.0, timestamp=float(k),
                           incoming_id=k)
        t_seq += time.perf_counter() - t1
        ok_s += int(sys_.initialized and not sys_.is_lost)
    seq_fps = B * (n - warm) / t_seq

    import json
    print(json.dumps({
        "metric": "multiseq_aggregate_fps",
        "B": B, "frames_per_seq": n, "resolution": f"{w}x{h}",
        "batched_fps": round(batched_fps, 2),
        "sequential_fps": round(seq_fps, 2),
        "speedup": round(batched_fps / max(seq_fps, 1e-9), 2),
        "mode": ms.lockstep_mode,
        "healthy_batched": ok_b, "healthy_sequential": ok_s,
        "devices": n_dev,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
