"""Structured metrics / logging.

Rebuild of the reference's observability (SURVEY.md §5): the 9 gated log
streams and per-KF console line (FullSystem.cpp:76-121, printLogLine
:1707-1751) become one structured JSONL stream plus rolling timing stats
(the viewer's tracking/mapping ms deques, PangolinDSOViewer.h:128-134).
"""

from __future__ import annotations

import json
import time
from collections import deque


class MetricsLogger:
    def __init__(self, path: str | None = None, window: int = 100):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.track_ms = deque(maxlen=window)
        self.map_ms = deque(maxlen=window)
        self.kf_stage_ms = deque(maxlen=window)
        self.counters = {}

    def log(self, event: str, **fields):
        rec = dict(t=time.time(), event=event, **fields)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def bump(self, name: str, n: int = 1):
        self.counters[name] = self.counters.get(name, 0) + n

    def frame(self, ms: float, is_kf: bool):
        """Tracking-half wall time of one frame (is_kf = became a keyframe;
        its mapping-half cost is the matching 'keyframe' record)."""
        self.track_ms.append(ms)
        self.log("frame", ms=round(ms, 2), kf=is_kf)

    def keyframe(self, kf_id: int, rmse: float, n_points: int, n_frames: int,
                 window_span: tuple, stages: dict | None = None):
        """Per-KF console line equivalent (printLogLine) plus a per-stage
        host-blocking-ms breakdown."""
        self.kf_stage_ms.append(stages or {})
        if stages and "total" in stages:
            self.map_ms.append(stages["total"])
        return self.log(
            "keyframe", kf=kf_id, rmse=round(float(rmse), 4),
            points=n_points, frames=n_frames, span=list(window_span),
            stages=stages or {},
        )

    def summary(self) -> dict:
        import numpy as np

        out = dict(self.counters)
        if self.track_ms:
            out["track_ms_median"] = float(np.median(self.track_ms))
        if self.map_ms:
            out["map_ms_median"] = float(np.median(self.map_ms))
        if self.kf_stage_ms:
            keys = set().union(*self.kf_stage_ms)
            out["kf_stage_ms_median"] = {
                k: float(np.median([d.get(k, 0.0) for d in self.kf_stage_ms]))
                for k in sorted(keys)
            }
        return out

    def close(self):
        if self._fh:
            self._fh.close()
