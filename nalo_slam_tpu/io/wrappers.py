"""Output wrapper interface: observers of the SLAM state.

Rebuild of the Output3DWrapper callback contract
(reference: src/IOWrapper/Output3DWrapper.h:113-206).  Implementations:
SampleOutputWrapper streams marginalized keyframe points (and dense map
points when present) to a PCD file like SampleOutputWrapper.h:84-197; the
reference's Pangolin GUI is out of scope for the parity metric (SURVEY.md
§2.3) -- TrajectoryWriter covers the result.txt path.
"""

from __future__ import annotations

import numpy as np

from ..config import PATTERN
from .results import write_pcd, write_tum_trajectory


class Output3DWrapper:
    """Callback interface; all hooks optional."""

    def publish_cam_pose(self, shell, calib):
        pass

    def publish_keyframes(self, frames, final: bool, window, calib):
        pass

    def publish_graph(self, connectivity):
        pass

    def push_live_frame(self, frame):
        pass

    def push_depth_image(self, image):
        pass

    def join(self):
        pass


class SampleOutputWrapper(Output3DWrapper):
    """Accumulates world-frame points of finalized (marginalized) keyframes
    and writes a PCD at join() (reference SampleOutputWrapper.h:84-197)."""

    def __init__(self, pcd_path: str = "pcl_data_tmp.pcd"):
        self.pcd_path = pcd_path
        self.points: list[np.ndarray] = []

    def publish_keyframes(self, frames, final: bool, window, calib):
        if not final:
            return
        p = window.pts
        fx, fy, cx, cy = window.calib_value
        for fs in frames:
            try:
                idx = window.frames.index(fs)
            except ValueError:
                continue
            m = p.active & (p.host == idx) & (p.idepth > 0)
            if not m.any():
                continue
            z = 1.0 / p.idepth[m]
            x = (p.u[m] - cx) / fx * z
            y = (p.v[m] - cy) / fy * z
            pts_cam = np.stack([x, y, z], 1)
            c2w = fs.PRE_camToWorld
            self.points.append(pts_cam @ c2w.R.T + c2w.t)

    def add_map_points(self, xyz_world: np.ndarray):
        if len(xyz_world):
            self.points.append(np.asarray(xyz_world))

    def join(self):
        pts = (np.concatenate(self.points) if self.points
               else np.zeros((0, 3), np.float32))
        write_pcd(self.pcd_path, pts)


class TrajectoryWriter(Output3DWrapper):
    def __init__(self, path: str = "result.txt"):
        self.path = path
        self.rows = []

    def write(self, full_system):
        write_tum_trajectory(self.path, full_system.trajectory())


class GraphWriter(Output3DWrapper):
    """Persists the constraint graph published per keyframe (reference
    publishGraph, Output3DWrapper.h:113-140: host-target connectivity with
    active/marginalized residual counts from EnergyFunctional.cpp:423-458)."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.connectivity: dict = {}

    def publish_graph(self, connectivity):
        self.connectivity = dict(connectivity)

    def join(self):
        if self.path:
            with open(self.path, "w") as f:
                for (h, t), (na, nm) in sorted(self.connectivity.items()):
                    f.write(f"{h} {t} {na} {nm}\n")


class RenderWrapper(Output3DWrapper):
    """Offline render sink: the reference viewer's video / depth-image
    panes (PangolinDSOViewer.h:97-101, pushLiveFrame/pushDepthImage
    Output3DWrapper.h:160-199) become PNG dumps under a directory, plus a
    top-down trajectory plot at join()."""

    wants_depth_image = True
    wants_live_frame = True

    def __init__(self, out_dir: str, every: int = 1):
        import os

        self.dir = out_dir
        self.every = max(int(every), 1)
        os.makedirs(out_dir, exist_ok=True)
        self._n_live = 0
        self._n_depth = 0
        self._poses: list[np.ndarray] = []

    def publish_cam_pose(self, shell, calib):
        self._poses.append(np.asarray(shell.camToWorld.t))

    def push_live_frame(self, frame):
        from ..utils.viz import save_png

        if self._n_live % self.every == 0:
            img = np.clip(np.asarray(frame), 0, 255).astype(np.uint8)
            save_png(f"{self.dir}/live_{self._n_live:06d}.png", img)
        self._n_live += 1

    def push_depth_image(self, image):
        """image: dict(idepth, valid, background) of the newest keyframe.
        The interactive freeDebugParam5 knob ('d'/'s' keys) toggles the
        gray-image underlay, mirroring debugPlot's mode switch (reference
        FullSystemDebugStuff.cpp:119,187)."""
        from ..utils.viz import render_idepth_map, save_png
        from .. import config as _cfg

        bg = image.get("background")
        if int(getattr(_cfg, "FREE_DEBUG_PARAM5", 0) + 0.5) % 2 == 1:
            bg = None
        img = render_idepth_map(image["idepth"], image.get("valid"), bg)
        save_png(f"{self.dir}/depth_{self._n_depth:06d}.png", img)
        self._n_depth += 1

    def join(self):
        from ..utils.viz import render_trajectory_topdown, save_png

        if self._poses:
            save_png(f"{self.dir}/trajectory.png",
                     render_trajectory_topdown(np.stack(self._poses)))
