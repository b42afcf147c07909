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
