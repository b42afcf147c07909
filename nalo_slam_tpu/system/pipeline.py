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

Semantics preserved:
* the first two keyframes are processed synchronously (:1160-1171),
* a queue deeper than 3 frames enables catch-up: non-keyframes are
  dropped with pose-only bookkeeping (:1209-1230),
* a pending keyframe request coalesces to the newest queued frame
  (needNewKFAfter, :1232-1243).
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
            self._queue.append((frame, need_kf))
            if need_kf:
                self._need_kf_after = frame["shell"].id
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
        while True:
            with self._cond:
                while self._running and not self._queue:
                    self._cond.wait(0.05)
                if not self._running and not self._queue:
                    return
                frame, need_kf = self._queue.popleft()
                backlog = len(self._queue)
                self._cond.notify_all()
            try:
                if backlog > 3 and not need_kf:
                    # catch-up: drop the frame, keep its pose (:1209-1230)
                    fs.discard_frame(frame)
                elif need_kf or self._need_kf_after >= fs.all_kf_shells[-1].id:
                    fs.map_frame(frame, need_kf)
                else:
                    fs.map_frame(frame, False)
            except Exception as e:  # surface mapping errors to the caller
                self._error = e
                with self._cond:
                    self._running = False
                    self._cond.notify_all()
                return
