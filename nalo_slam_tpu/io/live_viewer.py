"""Interactive live 3D viewer: a self-contained web replacement for the
reference's Pangolin GUI (src/IOWrapper/Pangolin/PangolinDSOViewer.h:56-137).

An Output3DWrapper implementation that serves a single-page WebGL viewer
(no external JS dependencies -- this environment has zero egress, so the
renderer is a small hand-written WebGL1 point/line pipeline in
live_viewer.html) over a background ThreadingHTTPServer.  Shown live, as
in the reference GUI:

* per-keyframe world point clouds (active window + frozen marginalized),
* keyframe camera frusta and the current camera,
* the full camera trajectory,
* the host-target constraint graph (publishGraph),
* view toggles / point-size / sparsity controls (the reference's
  settings_show* panel, PangolinDSOViewer.h:116-130).

Transport: `/state` returns small JSON metadata (poses, versions, graph,
trajectory tail); point payloads ride separately as raw little-endian
binary (`/cloud/<id>`: N*(3 f32 xyz) followed by N u8 gray) so a dense map
never passes through JSON.  The browser polls ~4 Hz and re-fetches only
clouds whose version advanced.
"""

from __future__ import annotations

import json
import os
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .wrappers import Output3DWrapper

_HTML_PATH = os.path.join(os.path.dirname(__file__), "live_viewer.html")


def _pose12(se3) -> list:
    """Row-major [R | t] (3x4) as 12 floats."""
    return [round(float(x), 6)
            for x in np.concatenate([se3.R, se3.t[:, None]], 1).reshape(-1)]


class LiveViewer(Output3DWrapper):
    """Serve the live state over HTTP; all hooks are cheap host-side copies
    under one lock, so the SLAM loop never blocks on a slow client."""

    wants_live_frame = False
    wants_depth_image = False

    def __init__(self, port: int = 8765, max_points_per_kf: int = 4096,
                 host: str = "127.0.0.1"):
        self._lock = threading.Lock()
        self._version = 0
        # kf_id -> dict(v, pose, n, final, buf)
        self._clouds: dict[int, dict] = {}
        self._kf_order: list[int] = []
        self._traj: list[list[float]] = []
        self._cur_pose: list[float] | None = None
        self._edges: list[list[int]] = []
        self.max_points_per_kf = int(max_points_per_kf)
        self._srv = ThreadingHTTPServer((host, port), _make_handler(self))
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True, name="live-viewer")
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self._srv.server_address[0]}:{self.port}/"

    # -- Output3DWrapper hooks ---------------------------------------------

    def publish_cam_pose(self, shell, calib):
        p = _pose12(shell.camToWorld)
        with self._lock:
            self._version += 1
            self._cur_pose = p
            self._traj.append([p[3], p[7], p[11]])

    def publish_keyframes(self, frames, final: bool, window, calib):
        pts = window.pts
        fx, fy, cx, cy = window.calib_value
        updates = []
        for fs in frames:
            try:
                idx = window.frames.index(fs)
            except ValueError:
                continue
            m = pts.active & (pts.host == idx) & (pts.idepth > 0)
            z = 1.0 / pts.idepth[m]
            x = (pts.u[m] - cx) / fx * z
            y = (pts.v[m] - cy) / fy * z
            cam = np.stack([x, y, z], 1).astype(np.float32)
            c2w = fs.PRE_camToWorld
            world = cam @ c2w.R.T.astype(np.float32) + c2w.t.astype(np.float32)
            gray = np.clip(pts.color[m].mean(axis=1), 0, 255).astype(np.uint8)
            if len(world) > self.max_points_per_kf:
                step = int(np.ceil(len(world) / self.max_points_per_kf))
                world, gray = world[::step], gray[::step]
            buf = world.astype("<f4").tobytes() + gray.tobytes()
            updates.append((fs.frame_id, _pose12(c2w), len(world), buf))
        with self._lock:
            for kf_id, pose, n, buf in updates:
                self._version += 1
                if kf_id not in self._clouds:
                    self._kf_order.append(kf_id)
                self._clouds[kf_id] = dict(v=self._version, pose=pose, n=n,
                                           final=bool(final), buf=buf)

    def publish_cloud(self, kf_id: int, pose12, xyz_cam: np.ndarray,
                      gray: np.ndarray, final: bool = False):
        """Generic cloud feed (camera-frame points + camToWorld [R|t] as 12
        floats): lets non-SLAM producers (e.g. the BTS live-3D demo,
        tools/bts_live_3d.py) stream into the same viewer."""
        pose12 = [float(x) for x in np.asarray(pose12).reshape(-1)]
        R = np.asarray(pose12, np.float32).reshape(3, 4)
        world = xyz_cam.astype(np.float32) @ R[:, :3].T + R[:, 3]
        g = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
        if len(world) > self.max_points_per_kf:
            step = int(np.ceil(len(world) / self.max_points_per_kf))
            world, g = world[::step], g[::step]
        buf = world.astype("<f4").tobytes() + g.tobytes()
        with self._lock:
            self._version += 1
            if kf_id not in self._clouds:
                self._kf_order.append(kf_id)
            self._clouds[kf_id] = dict(v=self._version, pose=pose12,
                                       n=len(world), final=bool(final),
                                       buf=buf)
            self._cur_pose = pose12
            self._traj.append([pose12[3], pose12[7], pose12[11]])

    def publish_graph(self, connectivity):
        edges = [[int(h), int(t), int(na), int(nm)]
                 for (h, t), (na, nm) in connectivity.items()]
        with self._lock:
            self._version += 1
            self._edges = edges

    def join(self):
        self._srv.shutdown()
        self._srv.server_close()

    # -- HTTP payloads -------------------------------------------------------

    def state_json(self, since: int, traj_n: int) -> bytes:
        with self._lock:
            kfs = [dict(id=k, v=c["v"], n=c["n"], final=c["final"],
                        pose=c["pose"],
                        stale=c["v"] > since)
                   for k in self._kf_order
                   for c in (self._clouds[k],)]
            out = dict(
                version=self._version,
                cur=self._cur_pose,
                traj_n=len(self._traj),
                traj=self._traj[traj_n:],
                kfs=kfs,
                edges=self._edges,
            )
        return json.dumps(out).encode()

    def cloud_bytes(self, kf_id: int) -> bytes | None:
        with self._lock:
            c = self._clouds.get(kf_id)
            if c is None:
                return None
            return struct.pack("<i", c["n"]) + c["buf"]


def _make_handler(viewer: LiveViewer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # keep the SLAM console clean
            pass

        def _send(self, code: int, ctype: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path in ("/", "/index.html"):
                with open(_HTML_PATH, "rb") as f:
                    self._send(200, "text/html; charset=utf-8", f.read())
            elif u.path == "/state":
                q = parse_qs(u.query)
                since = int(q.get("since", ["0"])[0])
                traj_n = int(q.get("traj_n", ["0"])[0])
                self._send(200, "application/json",
                           viewer.state_json(since, traj_n))
            elif u.path.startswith("/cloud/"):
                try:
                    body = viewer.cloud_bytes(int(u.path.split("/")[2]))
                except ValueError:
                    body = None
                if body is None:
                    self._send(404, "text/plain", b"no such keyframe")
                else:
                    self._send(200, "application/octet-stream", body)
            else:
                self._send(404, "text/plain", b"not found")

    return Handler
