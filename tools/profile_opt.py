"""Split the KF optimize/activate stages into fixed vs per-iteration cost.

Runs the KITTI-class (or 320x240) synthetic sequence to steady state,
then replays the window-GN device program at max_iters = 1..6 and the
activation program, each timed dispatch->pull, so the compile-fixed tail
(final relinearize + push/pull/link) separates from the per-GN-iteration
cost.  Informs the convergence-aware iteration budget (ROADMAP queue a/b).

Usage: python tools/profile_opt.py [kitti] [n_frames]
"""

from __future__ import annotations

import os as _os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/nalo_jax_cache_" + _os.environ.get("JAX_PLATFORMS", "axon").split(",")[0],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    from nalo_slam_tpu.config import Settings, preset as _preset
    from nalo_slam_tpu.geometry import SE3, PyramidCalib
    from nalo_slam_tpu.system import FullSystem
    from nalo_slam_tpu.utils.synthetic import PlaneScene
    from nalo_slam_tpu.backend import device_opt as D

    kitti = len(sys.argv) > 1 and sys.argv[1] == "kitti"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    rng = np.random.default_rng(7)
    if kitti:
        w, h = 1224, 368
        calib = PyramidCalib.make(w, h, 707.0, 707.0, (w - 1) / 2, (h - 1) / 2)
        scene = PlaneScene(calib, z0=6.0)
        s = _preset(0, Settings()).replace(
            use_lidar=False, dense_track=False, plane_optimize=False)
        mk = lambda k: np.array([0.04 * k, 0.01 * np.sin(0.2 * k), 0.03 * k,
                                 0.0, 0.002 * np.sin(0.11 * k), 0.0])
    else:
        w, h = 320, 240
        calib = PyramidCalib.make(w, h, 260.0, 260.0, (w - 1) / 2, (h - 1) / 2)
        scene = PlaneScene(calib, z0=4.0)
        s = Settings(
            max_window_frames=8, max_points=2048, max_immature_per_frame=1024,
            desired_point_density=800.0, desired_immature_density=600.0,
            use_lidar=False, dense_track=False, plane_optimize=False,
        )
        mk = lambda k: np.array([0.05 * k, 0.008 * np.sin(0.2 * k), 0.01 * k,
                                 0.0, 0.002 * np.sin(0.11 * k), 0.0])

    sys_ = FullSystem(s, calib)
    sys_.precompile()
    for k in range(n_frames):
        img, _ = scene.render(SE3.exp(mk(k)))
        img = img + rng.normal(scale=1.5, size=img.shape).astype(np.float32)
        sys_.add_frame(img, exposure=1.0, timestamp=float(k), incoming_id=k)
        if sys_.is_lost:
            print("LOST at", k)
            return

    wo = sys_.window
    print(f"window: n_frames={wo.n_frames} P={wo.P} "
          f"n_live={int((wo.pts.r_exists.any(1) | wo.pts.active).sum())} "
          f"n_active={int(wo.pts.active.sum())}")

    # --- GN program: replay at varying max_iters (state is re-read each
    # time from the same host window, so each replay is identical) ---
    import nalo_slam_tpu.backend.energy as E
    for it in (1, 2, 3, 4, 6):
        ts = []
        for rep in range(3):
            flat_in, flat_u8, idx, pts_static, r_energy, meta = E._wo_gn_prepare(
                wo, it)
            t0 = time.perf_counter()
            if idx is None:
                out = wo._dev_opt.flat(
                    wo.images, wo.jstore, jnp.asarray(flat_in),
                    jnp.asarray(flat_u8), pts_static, r_energy,
                    jnp.int32(meta["max_iters"]), jnp.int32(meta["newest"]),
                    wo.quads)
            else:
                fn = D.make_device_optimizer_compact(wo.s, wo.F, wo.P,
                                                     meta["P_eff"])
                out = fn(wo.images, wo.jstore, jnp.asarray(flat_in),
                         jnp.asarray(flat_u8), jnp.asarray(idx), pts_static,
                         r_energy, jnp.int32(meta["max_iters"]),
                         jnp.int32(meta["newest"]), wo.quads)
            flat = np.asarray(out["flat"])
            ts.append(1000 * (time.perf_counter() - t0))
        print(f"GN max_iters={it}: P_eff={meta['P_eff']} "
              f"dispatch+pull ms = {[round(t,1) for t in ts]}")

    # prepare-side cost
    t0 = time.perf_counter()
    for _ in range(5):
        E._wo_gn_prepare(wo, 6)
    print(f"gn_prepare host ms = {round(1000*(time.perf_counter()-t0)/5, 1)}")

    # --- activation program ---
    prep = sys_._activate_prepare()
    if prep is not None:
        t0 = time.perf_counter()
        for _ in range(3):
            tq0 = time.perf_counter()
            flat_dev, new_valid = sys_._activate_dispatch(prep)
            tq1 = time.perf_counter()
            flat = np.asarray(flat_dev)
            tq2 = time.perf_counter()
            print(f"activate: dispatch {1000*(tq1-tq0):.1f} ms, "
                  f"pull-wait {1000*(tq2-tq1):.1f} ms")
        t1 = time.perf_counter()
        t0 = time.perf_counter()
        for _ in range(5):
            sys_._activate_prepare()
        print(f"activate_prepare host ms = "
              f"{round(1000*(time.perf_counter()-t0)/5, 1)}")

if __name__ == "__main__":
    main()
