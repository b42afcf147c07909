"""CLI driver: dataset playback through the full system.

Rebuild of src/main_dso_pangolin.cpp: key=value argument style (:183-448),
preset tables (:100-181), the playback loop with optional real-time pacing
and frame skipping (:517-670), reset-on-initFailed (:596-616), result.txt
export (:631) and the fps summary (:638-649).

Usage:
  python -m nalo_slam_tpu.main files=<images> calib=<camera.txt> \
      [gamma=pcalib.txt] [vignette=vignette.png] [masks=<dir>] \
      [colors=<dir>] [preset=0] [mode=0] [dense=0] [planeOpt=0] \
      [start=0] [end=100000] [speed=0] [output=result.txt] \
      [log=metrics.jsonl] [pipelined=1] [render=renders/] \
      [checkpoint=state.npz] [checkpoint_every=0] [resume=state.npz] \
      [profile=<trace-dir>] [logStuff=0]

profile= writes a JAX profiler trace (open with TensorBoard / xprof) for
the whole playback; logStuff=1 turns on the per-KF eigen-spectrum stream
(reference setting_logStuff, FullSystem.cpp:1755-1835).
"""

from __future__ import annotations

import os
import select
import sys
import time

import numpy as np
import jax

# NALO_PLATFORM=cpu forces the CPU backend for this CLI run.  The env
# var JAX_PLATFORMS is NOT sufficient here: the container's axon
# sitecustomize registers the TPU plugin at interpreter start and wins
# platform selection, so the switch must go through jax.config before
# any backend initializes (same mechanism as tests/conftest.py).
_plat = os.environ.get("NALO_PLATFORM", "")
if _plat:
    jax.config.update("jax_platforms", _plat)

# persistent XLA compile cache (per platform): repeat CLI runs skip the
# multi-minute first-compile cost on the tunneled device
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/nalo_jax_cache_"
    + (_plat or os.environ.get("JAX_PLATFORMS", "axon").split(",")[0]),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import Settings, parse_kv_args
from .geometry import PyramidCalib
from .io.dataset import ImageFolderReader
from .io.wrappers import SampleOutputWrapper, TrajectoryWriter
from .system import FullSystem
from .utils.metrics import MetricsLogger


def build_system(settings: Settings, reader: ImageFolderReader,
                 metrics: MetricsLogger | None = None) -> FullSystem:
    K = reader.undistorter.K
    calib = PyramidCalib.make(
        reader.undistorter.w, reader.undistorter.h,
        K[0, 0], K[1, 1], K[0, 2], K[1, 2],
    )
    gamma_grad = reader.photo.gamma.B_grad if settings.gamma_weights_pixel_select else None
    return FullSystem(settings, calib, gamma_b_grad=gamma_grad, metrics=metrics)


def _poll_key() -> str | None:
    """Non-blocking single-key read (reference handleKey,
    settings.cpp:236-251): only active when stdin is a terminal."""
    try:
        if not sys.stdin.isatty():
            return None
        r, _, _ = select.select([sys.stdin], [], [], 0)
        if r:
            return sys.stdin.read(1)
    except Exception:
        pass
    return None


def _handle_key(k: str) -> None:
    import nalo_slam_tpu.config as _cfg

    if k in ("d", "D"):
        _cfg.FREE_DEBUG_PARAM5 = (int(_cfg.FREE_DEBUG_PARAM5 + 1)) % 10
        print(f"new freeDebugParam5: {_cfg.FREE_DEBUG_PARAM5:.1f}!")
    elif k in ("s", "S"):
        _cfg.FREE_DEBUG_PARAM5 = (int(_cfg.FREE_DEBUG_PARAM5 - 1 + 10)) % 10
        print(f"new freeDebugParam5: {_cfg.FREE_DEBUG_PARAM5:.1f}!")


def run(argv: list[str]) -> int:
    settings, extras = parse_kv_args(argv)
    if "files" not in extras or "calib" not in extras:
        print(__doc__)
        return 1
    reader = ImageFolderReader(
        extras["files"], extras["calib"],
        gamma_file=extras.get("gamma"), vignette_file=extras.get("vignette"),
        masks_path=extras.get("masks"), colors_path=extras.get("colors"),
        photometric_mode=settings.photometric_calibration,
        settings=settings,
    )
    start = int(extras.get("start", 0))
    end = min(int(extras.get("end", 1 << 30)), len(reader))
    # preset playback-speed defaults (main_dso_pangolin.cpp:113/:134):
    # preset 1 enforces 1x real time, preset 3 enforces 5x; explicit
    # speed= overrides.  0 = as fast as possible.
    preset_speed = {1: 1.0, 3: 5.0}.get(int(extras.get("preset", -1)), 0.0)
    speed = float(extras.get("speed", preset_speed))

    metrics = MetricsLogger(extras.get("log"))
    sys_ = build_system(settings, reader, metrics)
    pcd_out = SampleOutputWrapper(extras.get("pcd", "pcl_data_tmp.pcd"))
    sys_.output_wrappers.append(pcd_out)
    if extras.get("render"):
        from .io.wrappers import RenderWrapper
        sys_.output_wrappers.append(RenderWrapper(extras["render"]))
    if extras.get("viewer"):
        # viewer=1 -> default port; viewer=<port> -> that port.  The
        # reference's Pangolin GUI (PangolinDSOViewer.h) becomes a local
        # web viewer; open the printed URL in a browser.
        from .io.live_viewer import LiveViewer
        vp = int(extras["viewer"])
        lv = LiveViewer(port=vp if vp > 1 else 8765)
        sys_.output_wrappers.append(lv)
        print(f"live viewer: {lv.url}")

    if extras.get("resume"):
        from .system.checkpoint import load_checkpoint
        load_checkpoint(extras["resume"], sys_)
        print(f"resumed from {extras['resume']} "
              f"(frame {len(sys_.all_shells)}, {sys_.window.n_frames} KFs)")
    ckpt_path = extras.get("checkpoint")
    ckpt_every = int(extras.get("checkpoint_every", 0))

    # front-load every XLA compile / cache-load (seconds each on first
    # encounter; without this they stall the run at the first frame-marg
    # keyframe and whenever an activation pad bucket is first hit)
    if extras.get("precompile", "1") not in ("0", "", "false"):
        sys_.precompile()

    # pipelined (track || map) is the DEFAULT execution model, matching the
    # reference's dual-thread deliverTrackedFrame/mappingLoop design
    # (FullSystem.cpp:1144-1263); pipelined=0 forces the sequential
    # linearizeOperation path
    runner = sys_
    pipelined = extras.get("pipelined", "1") not in ("0", "", "false")
    if pipelined:
        from .system.pipeline import PipelinedSystem
        runner = PipelinedSystem(sys_)

    prof_dir = extras.get("profile")
    if prof_dir:
        import jax as _jax
        _jax.profiler.start_trace(prof_dir)

    t_start = time.time()
    n_done = n_skipped = 0
    i = start
    while i < end:
        # real-time pacing (reference main_dso_pangolin.cpp:517-624): sleep
        # when ahead of schedule, DROP the frame when behind by more than
        # one frame interval (sSinceStart > timestamp -> skipFrame)
        if speed > 0 and i > start:
            rel_ts = (reader.get_timestamp(i) - reader.get_timestamp(start)) / speed
            since = time.time() - t_start
            if since < rel_ts:
                time.sleep(rel_ts - since)
            elif since > rel_ts + 0.5 / speed and sys_.initialized:
                n_skipped += 1
                i += 1
                continue
        k_key = _poll_key()
        if k_key:
            _handle_key(k_key)
        frame = reader.get_image(i)
        runner.add_frame(
            frame["image"], exposure=frame["exposure"],
            timestamp=frame["timestamp"], incoming_id=i,
            mask=frame["mask"], bgr=frame["bgr"],
        )
        n_done += 1
        if ckpt_path and ckpt_every and n_done % ckpt_every == 0:
            from .system.checkpoint import save_checkpoint
            if pipelined:
                runner.finish()
                runner = PipelinedSystem(sys_)
            save_checkpoint(ckpt_path, sys_)
        if sys_.init_failed and i - start < 250:
            # full reset preserving output wrappers (reference :596-616)
            print("RESETTING (init failed)")
            if pipelined:
                runner.finish()
            wrappers = sys_.output_wrappers
            sys_ = build_system(settings, reader, metrics)
            sys_.output_wrappers = wrappers
            runner = PipelinedSystem(sys_) if pipelined else sys_
        if sys_.is_lost:
            print("LOST!")
            break
        i += 1
    if pipelined:
        runner.finish()
    if prof_dir:
        _jax.profiler.stop_trace()
        print(f"profiler trace written to {prof_dir}")

    wall = time.time() - t_start
    print(
        f"processed {n_done} frames in {wall:.2f}s "
        f"({n_done / max(wall, 1e-9):.2f} fps, "
        f"{1000 * wall / max(n_done, 1):.1f} ms/frame"
        + (f", {n_skipped} skipped" if n_skipped else "") + ")"
    )
    if ckpt_path:
        from .system.checkpoint import save_checkpoint
        save_checkpoint(ckpt_path, sys_)
    summ = metrics.summary()
    if summ:
        print("metrics:", summ)
    TrajectoryWriter(extras.get("output", "result.txt")).write(sys_)
    # flush keyframes still in the window so short runs export a cloud too
    for fs in sys_.window.frames:
        pcd_out.publish_keyframes([fs], True, sys_.window, sys_.calib)
    pcd_out.join()
    metrics.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(run(sys.argv[1:]))
