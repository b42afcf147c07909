"""Result export: TUM-format trajectories and PCD point clouds.

Rebuild of FullSystem::printResult (reference src/FullSystem/FullSystem.cpp
:445-499) and the PCD streaming of SampleOutputWrapper
(src/IOWrapper/OutputWrapper/SampleOutputWrapper.h:84-197) without PCL.
"""

from __future__ import annotations

import numpy as np


def write_tum_trajectory(path: str, rows):
    """rows: (timestamp, x, y, z, qx, qy, qz, qw)."""
    with open(path, "w") as f:
        for r in rows:
            f.write("%.9f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n" % tuple(r))


def write_pcd(path: str, xyz: np.ndarray, rgb: np.ndarray | None = None):
    """ASCII PCD v0.7 writer (replaces pcl::io)."""
    n = len(xyz)
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n")
        if rgb is not None:
            f.write("FIELDS x y z rgb\nSIZE 4 4 4 4\nTYPE F F F U\nCOUNT 1 1 1 1\n")
        else:
            f.write("FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n")
        f.write(f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA ascii\n")
        if rgb is not None:
            packed = (
                rgb[:, 0].astype(np.uint32) << 16
                | rgb[:, 1].astype(np.uint32) << 8
                | rgb[:, 2].astype(np.uint32)
            )
            for p, c in zip(xyz, packed):
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c}\n")
        else:
            for p in xyz:
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


def read_pcd(path: str) -> np.ndarray:
    pts = []
    with open(path) as f:
        data = False
        for line in f:
            if data:
                toks = line.split()
                if len(toks) >= 3:
                    pts.append([float(toks[0]), float(toks[1]), float(toks[2])])
            elif line.startswith("DATA"):
                data = True
    return np.array(pts)
