"""Host-side SE3 class (numpy float64).

The orchestrator keeps poses in double precision like the reference's Sophus
SE3d (src/util/NumType.h:48).  Device kernels receive (R, t) float32 arrays
extracted via ``.Rt32()``.
"""

from __future__ import annotations

import numpy as np

from . import lie


class SE3:
    __slots__ = ("R", "t")

    def __init__(self, R: np.ndarray | None = None, t: np.ndarray | None = None):
        self.R = np.eye(3, dtype=np.float64) if R is None else np.asarray(R, np.float64)
        self.t = np.zeros(3, dtype=np.float64) if t is None else np.asarray(t, np.float64).reshape(3)

    # -- constructors ------------------------------------------------------
    @staticmethod
    def exp(xi) -> "SE3":
        R, t = lie.se3_exp(np.asarray(xi, np.float64), xp=np)
        return SE3(R, t)

    @staticmethod
    def from_matrix(T) -> "SE3":
        T = np.asarray(T, np.float64)
        return SE3(T[:3, :3], T[:3, 3])

    @staticmethod
    def rot_xyzw(qx, qy, qz, qw, t=None) -> "SE3":
        """Quaternion (not necessarily normalized) + translation."""
        q = np.array([qw, qx, qy, qz], np.float64)
        q = q / np.linalg.norm(q)
        w, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        return SE3(R, t if t is not None else np.zeros(3))

    # -- group ops ----------------------------------------------------------
    def log(self) -> np.ndarray:
        return lie.se3_log(self.R, self.t, xp=np)

    def inverse(self) -> "SE3":
        R, t = lie.se3_inv(self.R, self.t, xp=np)
        return SE3(R, t)

    def __mul__(self, other: "SE3") -> "SE3":
        R, t = lie.se3_mul(self.R, self.t, other.R, other.t, xp=np)
        return SE3(R, t)

    def adj(self) -> np.ndarray:
        return lie.se3_adj(self.R, self.t, xp=np)

    # -- export -------------------------------------------------------------
    def matrix(self) -> np.ndarray:
        T = np.eye(4)
        T[:3, :3] = self.R
        T[:3, 3] = self.t
        return T

    def Rt32(self):
        return self.R.astype(np.float32), self.t.astype(np.float32)

    def copy(self) -> "SE3":
        return SE3(self.R.copy(), self.t.copy())

    def quaternion_xyzw(self) -> np.ndarray:
        """For TUM-format trajectory export."""
        R = self.R
        tr = np.trace(R)
        if tr > 0:
            s = np.sqrt(tr + 1.0) * 2
            w = 0.25 * s
            x = (R[2, 1] - R[1, 2]) / s
            y = (R[0, 2] - R[2, 0]) / s
            z = (R[1, 0] - R[0, 1]) / s
        elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
            s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
            w = (R[2, 1] - R[1, 2]) / s
            x = 0.25 * s
            y = (R[0, 1] + R[1, 0]) / s
            z = (R[0, 2] + R[2, 0]) / s
        elif R[1, 1] > R[2, 2]:
            s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
            w = (R[0, 2] - R[2, 0]) / s
            x = (R[0, 1] + R[1, 0]) / s
            y = 0.25 * s
            z = (R[1, 2] + R[2, 1]) / s
        else:
            s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
            w = (R[1, 0] - R[0, 1]) / s
            x = (R[0, 2] + R[2, 0]) / s
            y = (R[1, 2] + R[2, 1]) / s
            z = 0.25 * s
        return np.array([x, y, z, w])

    def __repr__(self):
        return f"SE3(t={self.t}, xi={self.log()})"
