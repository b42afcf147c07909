"""Live web viewer: HTTP contract + payload integrity.

The viewer replaces the reference's Pangolin GUI
(src/IOWrapper/Pangolin/PangolinDSOViewer.h:56-137); this test drives the
Output3DWrapper hooks with a real (tiny) SLAM run and checks the served
state: page, JSON metadata, binary cloud payloads, incremental traj/cloud
versioning.
"""

import json
import struct
import urllib.request

import numpy as np
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.io.live_viewer import LiveViewer
from nalo_slam_tpu.system import FullSystem
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib
from test_full_system import make_trajectory


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read(), r.headers.get("Content-Type", "")


@pytest.mark.slow
def test_live_viewer_serves_slam_state():
    s = Settings(
        max_window_frames=8, max_points=2048, max_immature_per_frame=512,
        desired_point_density=400.0, desired_immature_density=300.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    calib = default_calib(320, 240)
    scene = PlaneScene(calib, z0=3.0)
    gt = make_trajectory(12)
    sys_ = FullSystem(s, calib)
    lv = LiveViewer(port=0)   # ephemeral port
    try:
        sys_.output_wrappers.append(lv)
        for k in range(12):
            img, _ = scene.render(gt[k])
            sys_.add_frame(img, 1.0, float(k), k)
        assert sys_.initialized and not sys_.is_lost

        page, ctype = _get(lv.url)
        assert b"nalo-slam live" in page and "text/html" in ctype

        body, ctype = _get(lv.url + "state?since=0&traj_n=0")
        st = json.loads(body)
        assert "application/json" in ctype
        assert st["version"] > 0
        # publish_cam_pose fires only for tracked (post-init) frames,
        # like the reference's publishCamPose
        assert st["traj_n"] == len(st["traj"]) > 0
        assert st["traj_n"] <= len(sys_.all_shells)
        assert st["cur"] is not None and len(st["cur"]) == 12
        assert st["kfs"] and all(k["stale"] for k in st["kfs"])
        assert st["edges"], "constraint graph missing"

        # binary cloud payload: count header + xyz f32 + gray u8
        kf = next(k for k in st["kfs"] if k["n"] > 0)
        raw, ctype = _get(lv.url + f"cloud/{kf['id']}")
        assert "octet-stream" in ctype
        (n,) = struct.unpack("<i", raw[:4])
        assert n == kf["n"] and len(raw) == 4 + n * 12 + n
        xyz = np.frombuffer(raw, "<f4", n * 3, 4).reshape(n, 3)
        assert np.isfinite(xyz).all()
        # world points should be in front of the first camera (z>0-ish scene)
        assert xyz[:, 2].max() > 0

        # incremental: nothing stale when polling from the latest version
        body, _ = _get(lv.url +
                       f"state?since={st['version']}&traj_n={st['traj_n']}")
        st2 = json.loads(body)
        assert not any(k["stale"] for k in st2["kfs"])
        assert st2["traj"] == []

        # 404 on unknown cloud
        try:
            _get(lv.url + "cloud/99999")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        lv.join()
