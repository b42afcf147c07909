"""Pyramid camera intrinsics.

Mirrors the reference's global calibration pyramid
(src/util/globalCalib.cpp:45-105 and CoarseInitializer::makeK,
src/FullSystem/CoarseInitializer.cpp:939-975): level-l intrinsics are

    fx_l = fx_0 / 2^l,  cx_l = (cx_0 + 0.5) / 2^l - 0.5

and the number of usable levels halves w,h until the level has < 5000 px
(capped at PYR_LEVELS).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import PYR_LEVELS


@dataclass
class PyramidCalib:
    w: list[int]
    h: list[int]
    fx: np.ndarray  # (L,)
    fy: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    levels: int
    K: np.ndarray = field(init=False)   # (L,3,3) float64
    Ki: np.ndarray = field(init=False)

    def __post_init__(self):
        L = self.levels
        K = np.zeros((L, 3, 3))
        for l in range(L):
            K[l] = [[self.fx[l], 0, self.cx[l]], [0, self.fy[l], self.cy[l]], [0, 0, 1]]
        self.K = K
        self.Ki = np.linalg.inv(K)

    @staticmethod
    def make(w0: int, h0: int, fx: float, fy: float, cx: float, cy: float) -> "PyramidCalib":
        # pyrLevelsUsed (reference globalCalib.cpp:45-58)
        levels = 1
        wlvl, hlvl = w0, h0
        while wlvl % 2 == 0 and hlvl % 2 == 0 and wlvl * hlvl > 5000 and levels < PYR_LEVELS:
            wlvl //= 2
            hlvl //= 2
            levels += 1
        ws, hs = [w0], [h0]
        fxs, fys, cxs, cys = [fx], [fy], [cx], [cy]
        for l in range(1, levels):
            ws.append(w0 >> l)
            hs.append(h0 >> l)
            fxs.append(fxs[l - 1] * 0.5)
            fys.append(fys[l - 1] * 0.5)
            cxs.append((cx + 0.5) / (1 << l) - 0.5)
            cys.append((cy + 0.5) / (1 << l) - 0.5)
        return PyramidCalib(
            ws, hs, np.array(fxs), np.array(fys), np.array(cxs), np.array(cys), levels
        )

    def with_intrinsics(self, fx, fy, cx, cy) -> "PyramidCalib":
        """Rebuild pyramid from updated level-0 intrinsics (CPARS updates)."""
        return PyramidCalib.make(self.w[0], self.h[0], fx, fy, cx, cy)

    def value_vec(self) -> np.ndarray:
        return np.array([self.fx[0], self.fy[0], self.cx[0], self.cy[0]])
