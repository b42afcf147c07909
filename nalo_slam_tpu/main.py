"""CLI driver: dataset playback through the full system.

Rebuild of src/main_dso_pangolin.cpp: key=value argument style (:183-448),
preset tables (:100-181), the playback loop with optional real-time pacing
and frame skipping (:517-670), reset-on-initFailed (:596-616), result.txt
export (:631) and the fps summary (:638-649).

Usage:
  python -m nalo_slam_tpu.main files=<images> calib=<camera.txt> \
      [gamma=pcalib.txt] [vignette=vignette.png] [masks=<dir>] \
      [colors=<dir>] [preset=0] [mode=0] [dense=0] [planeOpt=0] \
      [start=0] [end=100000] [speed=0] [output=result.txt]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from .config import Settings, parse_kv_args
from .geometry import PyramidCalib
from .io.dataset import ImageFolderReader
from .io.wrappers import SampleOutputWrapper, TrajectoryWriter
from .system import FullSystem


def build_system(settings: Settings, reader: ImageFolderReader) -> FullSystem:
    K = reader.undistorter.K
    calib = PyramidCalib.make(
        reader.undistorter.w, reader.undistorter.h,
        K[0, 0], K[1, 1], K[0, 2], K[1, 2],
    )
    gamma_grad = reader.photo.gamma.B_grad if settings.gamma_weights_pixel_select else None
    return FullSystem(settings, calib, gamma_b_grad=gamma_grad)


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
    )
    start = int(extras.get("start", 0))
    end = min(int(extras.get("end", 1 << 30)), len(reader))
    speed = float(extras.get("speed", 0))  # 0 = as fast as possible

    sys_ = build_system(settings, reader)
    pcd_out = SampleOutputWrapper(extras.get("pcd", "pcl_data_tmp.pcd"))
    sys_.output_wrappers.append(pcd_out)

    t_start = time.time()
    n_done = 0
    i = start
    while i < end:
        frame = reader.get_image(i)
        if speed > 0 and i > start:
            target = t_start + (reader.get_timestamp(i) - reader.get_timestamp(start)) / speed
            delay = target - time.time()
            if delay > 0:
                time.sleep(delay)
        sys_.add_frame(
            frame["image"], exposure=frame["exposure"],
            timestamp=frame["timestamp"], incoming_id=i,
            mask=frame["mask"], bgr=frame["bgr"],
        )
        n_done += 1
        if sys_.init_failed and i - start < 250:
            # full reset preserving output wrappers (reference :596-616)
            print("RESETTING (init failed)")
            sys_ = build_system(settings, reader)
            sys_.output_wrappers.append(pcd_out)
        if sys_.is_lost:
            print("LOST!")
            break
        i += 1

    wall = time.time() - t_start
    print(
        f"processed {n_done} frames in {wall:.2f}s "
        f"({n_done / max(wall, 1e-9):.2f} fps, "
        f"{1000 * wall / max(n_done, 1):.1f} ms/frame)"
    )
    TrajectoryWriter(extras.get("output", "result.txt")).write(sys_)
    # flush keyframes still in the window so short runs export a cloud too
    for fs in sys_.window.frames:
        pcd_out.publish_keyframes([fs], True, sys_.window, sys_.calib)
    pcd_out.join()
    return 0


if __name__ == "__main__":
    raise SystemExit(run(sys.argv[1:]))
