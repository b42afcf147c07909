"""Track || map pipeline.

Rebuild of the reference's two-thread design (tracking thread + mapping
thread with a condition-variable queue and catch-up mode; reference
src/FullSystem/FullSystem.cpp:1144-1263 deliverTrackedFrame/mappingLoop,
mutexes FullSystem.h:281-341).

The tracking half (pyramid build + coarse track + KF decision) and the
mapping half (trace/activate/BA/marginalize) already dispatch their device
work as single calls, so overlapping them hides the keyframe BA behind the
next frames' tracking exactly like the reference hides it behind the
tracking thread.  Python threads suffice: the GIL is released inside the
XLA dispatch where the time is spent.

Semantics preserved (reference mappingLoop :1183-1252):
* the first two tracked frames after initialization are guaranteed
  keyframes (:1200-1208),
* whenever MORE frames are queued behind the popped one, it becomes a
  NON-keyframe regardless of its own flag -- keyframe requests coalesce
  to the frame popped from an otherwise-empty queue (:1213-1247),
* that frame becomes a keyframe iff a request arrived while tracking
  against the current latest keyframe (needNewKFAfter = the request
  frame's trackingRef id, compared to the latest KF id, :1171/:1236),
* a queue deeper than 3 frames arms catch-up mode: after each
  non-keyframe, one additional queued frame is dropped with pose-only
  bookkeeping (:1210-1231).
"""

from __future__ import annotations

import threading
from collections import deque


class PipelinedSystem:
    """Wraps FullSystem with the reference's asynchronous mapping thread."""

    def __init__(self, full_system):
        self.fs = full_system
        self._queue: deque = deque()
        self._cond = threading.Condition()
        self._running = True
        self._need_kf_after = -1
        self._error: Exception | None = None
        self._thread = threading.Thread(target=self._mapping_loop, daemon=True)
        self._thread.start()

    # -- tracking-thread side ---------------------------------------------
    def add_frame(self, image, exposure=1.0, timestamp=0.0, incoming_id=-1,
                  mask=None, bgr=None):
        fs = self.fs
        if self._error is not None:
            raise self._error
        if fs.is_lost:
            return
        if not fs.initialized:
            # initialization stays sequential (reference keeps the first
            # keyframes synchronous anyway)
            with self._cond:
                while self._queue:
                    self._cond.wait(0.01)
            fs.add_frame(image, exposure, timestamp, incoming_id, mask, bgr)
            return

        frame = fs.prepare_frame(image, exposure, timestamp, incoming_id, mask, bgr)
        need_kf = fs.track_only(frame)
        if need_kf is None:
            return
        with self._cond:
            self._queue.append(frame)
            if need_kf and frame["shell"].trackingRef is not None:
                # needNewKFAfter = the tracking ref's id (:1171)
                self._need_kf_after = frame["shell"].trackingRef.id
            self._cond.notify_all()

    def finish(self):
        """Block until the mapping queue drains (blockUntilMappingIsFinished)."""
        with self._cond:
            while self._queue and self._error is None:
                self._cond.wait(0.05)
            self._running = False
            self._cond.notify_all()
        self._thread.join(timeout=30)
        if self._error is not None:
            raise self._error

    # -- mapping-thread side ----------------------------------------------
    def _mapping_loop(self):
        fs = self.fs
        catchup = False
        while True:
            with self._cond:
                while self._running and not self._queue:
                    self._cond.wait(0.05)
                if not self._running and not self._queue:
                    return
                frame = self._queue.popleft()
                backlog = len(self._queue)
                self._cond.notify_all()
            try:
                if len(fs.all_kf_shells) <= 2:
                    # guaranteed KF for the first tracked frames (:1200-1208)
                    fs.map_frame(frame, True)
                elif backlog > 0:
                    # other frames queued: this one is a non-keyframe
                    # (requests coalesce, :1213-1231)
                    if backlog > 3:
                        catchup = True
                    fs.map_frame(frame, False)
                    if catchup:
                        with self._cond:
                            drop = self._queue.popleft() if self._queue else None
                            self._cond.notify_all()
                        if drop is not None:
                            fs.discard_frame(drop)
                else:
                    # queue drained: keyframe iff a request arrived while
                    # tracking against the current latest KF, or in
                    # take-every-KF mode (setting_realTimeMaxKF, :1235)
                    if (fs.s.real_time_max_kf
                            or self._need_kf_after >= fs.all_kf_shells[-1].id):
                        fs.map_frame(frame, True)
                        catchup = False
                    else:
                        fs.map_frame(frame, False)
            except Exception as e:  # surface mapping errors to the caller
                self._error = e
                with self._cond:
                    self._running = False
                    self._cond.notify_all()
                return
