"""Checkpoint-watching eval scheduler.

Rebuild of mp_mask/pytorch/run_bts_eval_schedule.py (an apscheduler cron
job that re-runs bts_eval on the newest checkpoint every N minutes): a
plain-threading watcher that scans a checkpoint directory, runs an eval
callback on every checkpoint step it has not evaluated yet, and appends
the metrics to a jsonl log.  No external scheduler dependency.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time

_STEP_RE = re.compile(r"^step_(\d+)$")


def scan_checkpoints(ckpt_dir: str) -> list[int]:
    """Step numbers of complete checkpoints under ckpt_dir (orbax layout:
    one step_<N> directory per save, as written by infer.save_checkpoint)."""
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and os.path.isdir(os.path.join(ckpt_dir, name)):
            steps.append(int(m.group(1)))
    return sorted(steps)


class EvalScheduler:
    """Polls ckpt_dir every `interval` seconds; for each new step, calls
    eval_fn(step) and logs its metric dict to <ckpt_dir>/eval_log.jsonl."""

    def __init__(self, ckpt_dir: str, eval_fn, interval: float = 300.0,
                 log_path: str | None = None):
        self.ckpt_dir = ckpt_dir
        self.eval_fn = eval_fn
        self.interval = interval
        self.log_path = log_path or os.path.join(ckpt_dir, "eval_log.jsonl")
        self.done: set[int] = set()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def poll_once(self) -> list[int]:
        """One scan-and-eval pass; returns the steps evaluated."""
        fresh = [s for s in scan_checkpoints(self.ckpt_dir)
                 if s not in self.done]
        for step in fresh:
            metrics = self.eval_fn(step)
            self.done.add(step)
            rec = dict(step=step, time=time.time(), **(metrics or {}))
            with open(self.log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return fresh

    def start(self):
        def loop():
            while not self._stop.is_set():
                try:
                    self.poll_once()
                except Exception as e:   # keep watching after a bad ckpt
                    with open(self.log_path, "a") as f:
                        f.write(json.dumps(dict(error=str(e),
                                                time=time.time())) + "\n")
                self._stop.wait(self.interval)

        self._thread = threading.Thread(target=loop, daemon=True,
                                        name="bts-eval-scheduler")
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
