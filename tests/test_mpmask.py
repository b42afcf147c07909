import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from nalo_slam_tpu.mpmask.bts import BtsConfig, BtsModel, local_planar_guidance
from nalo_slam_tpu.mpmask.train import (init_sharded, make_optimizer,
                                        make_train_step, silog_loss)
from nalo_slam_tpu.mpmask.evaluate import compute_errors


def test_lpg_constant_plane():
    # fronto-parallel plane: n=(0,0,1), dist=d -> depth == d everywhere
    pe = np.zeros((1, 2, 3, 4), np.float32)
    pe[..., 2] = 1.0
    pe[..., 3] = 5.0
    d = local_planar_guidance(jnp.asarray(pe), 4)
    assert d.shape == (1, 8, 12)
    np.testing.assert_allclose(np.asarray(d), 5.0, atol=1e-5)


def test_silog_zero_for_exact():
    gt = jnp.ones((2, 8, 8)) * 3.0
    mask = jnp.ones((2, 8, 8), bool)
    assert float(silog_loss(gt, gt, mask)) < 1e-3


def test_bts_forward_shapes():
    cfg = BtsConfig.tiny()
    model = BtsModel(cfg)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    d8, d4, d2, r1, final = model.apply(variables, x, train=False)
    assert final.shape == (1, 64, 96, 1)
    assert d8.shape == (1, 64, 96, 1)
    assert float(final.min()) >= 0.0 and float(final.max()) <= 1.0


@pytest.mark.slow
def test_sharded_train_step_decreases_loss():
    cfg = BtsConfig.tiny()
    model = BtsModel(cfg)
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    B, H, W = 4, 32, 64
    params, stats = init_sharded(model, mesh, (1, H, W, 3))
    tx = make_optimizer(1e-3, 50)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    gt = jnp.asarray(1.0 + 10.0 * rng.random((B, H, W)), jnp.float32)
    with jax.sharding.set_mesh(mesh):
        losses = []
        for _ in range(8):
            params, stats, opt_state, loss = step(params, stats, opt_state, imgs, gt)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_compute_errors_reference_values():
    gt = np.full(100, 4.0)
    pred = np.full(100, 5.0)
    m = compute_errors(gt, pred)
    np.testing.assert_allclose(m["abs_rel"], 0.25)
    np.testing.assert_allclose(m["rmse"], 1.0)
    assert m["d1"] == 0.0  # 5/4 == 1.25 is not strictly < 1.25


def test_eval_scheduler_polls_new_checkpoints(tmp_path):
    """run_bts_eval_schedule equivalent: every new step_<N> checkpoint is
    evaluated exactly once and logged (mpmask/eval_schedule.py)."""
    import json
    import os

    from nalo_slam_tpu.mpmask.eval_schedule import EvalScheduler, scan_checkpoints

    d = str(tmp_path)
    seen = []
    sch = EvalScheduler(d, lambda s: (seen.append(s), {"d1": 0.9 + s})[1],
                        interval=999.0)
    assert sch.poll_once() == [] and scan_checkpoints(d) == []
    os.makedirs(os.path.join(d, "step_0"))
    os.makedirs(os.path.join(d, "step_100"))
    assert sch.poll_once() == [0, 100]
    assert sch.poll_once() == []          # nothing new -> no re-eval
    os.makedirs(os.path.join(d, "step_200"))
    open(os.path.join(d, "step_bogus"), "w").close()   # non-dir ignored
    assert sch.poll_once() == [200]
    assert seen == [0, 100, 200]
    recs = [json.loads(l) for l in open(os.path.join(d, "eval_log.jsonl"))]
    assert [r["step"] for r in recs] == [0, 100, 200]
    assert recs[1]["d1"] == 100.9


def test_bts_live_3d_unproject_and_publish():
    """bts_live_3d equivalent: depth map -> camera-frame cloud -> viewer
    publish_cloud (tools/bts_live_3d.py + LiveViewer.publish_cloud)."""
    import json
    import struct
    import sys
    import urllib.request
    import os as _os

    import numpy as np

    sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "tools"))
    from bts_live_3d import unproject
    from nalo_slam_tpu.io.live_viewer import LiveViewer

    h, w = 48, 64
    depth = np.full((h, w), 2.0, np.float32)
    depth[0, 0] = 0.0          # invalid -> dropped
    gray = np.full((h, w), 128.0, np.float32)
    fx = fy = 50.0
    cx, cy = (w - 1) / 2, (h - 1) / 2
    xyz, g = unproject(depth, gray, fx, fy, cx, cy, stride=2)
    assert (xyz[:, 2] == 2.0).all() and len(xyz) == (h // 2) * (w // 2) - 1
    # center pixel unprojects to the optical axis
    ci = np.argmin(np.abs(xyz[:, 0]) + np.abs(xyz[:, 1]))
    assert abs(xyz[ci, 0]) < 2 * 2.0 / fx and abs(xyz[ci, 1]) < 2 * 2.0 / fx

    lv = LiveViewer(port=0)
    try:
        pose = np.concatenate([np.eye(3), [[0], [0], [1.0]]], 1)
        lv.publish_cloud(0, pose, xyz, g)
        st = json.loads(urllib.request.urlopen(
            lv.url + "state?since=0&traj_n=0", timeout=10).read())
        assert st["kfs"][0]["n"] == len(xyz)
        raw = urllib.request.urlopen(lv.url + "cloud/0", timeout=10).read()
        (n,) = struct.unpack("<i", raw[:4])
        world = np.frombuffer(raw, "<f4", n * 3, 4).reshape(n, 3)
        # world z = cam z + 1 (pose translation)
        assert np.allclose(world[:, 2], 3.0)
    finally:
        lv.join()
