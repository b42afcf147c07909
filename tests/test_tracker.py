import jax
import jax.numpy as jnp
import numpy as np
import pytest

# kernel-parity suite: meaningful on real TPU via -m axon (see conftest)
pytestmark = pytest.mark.axon

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.ops import build_pyramid
from nalo_slam_tpu.frontend.tracker import (make_track_fn,
    make_coarse_depth_maps, compact_pc, pc_caps_for)
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib


def _setup_pair(ref_pose, new_pose, calib=None):
    calib = calib or default_calib()
    scene = PlaneScene(calib, z0=3.0)
    ref_img, ref_idepth = scene.render(ref_pose)
    new_img, _ = scene.render(new_pose)
    ref_dIs, _ = build_pyramid(jnp.asarray(ref_img), calib.levels)
    new_dIs, _ = build_pyramid(jnp.asarray(new_img), calib.levels)
    # dense GT reference-depth maps per level (interior-valid)
    ref_maps = []
    ref_colors = []
    idl = ref_idepth
    for lvl in range(calib.levels):
        h, w = calib.h[lvl], calib.w[lvl]
        if lvl > 0:
            idl = 0.25 * (idl[0::2, 0::2] + idl[0::2, 1::2] + idl[1::2, 0::2] + idl[1::2, 1::2])
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        valid = (xx >= 2) & (xx < w - 2) & (yy >= 2) & (yy < h - 2)
        ref_maps.append((jnp.asarray(idl.astype(np.float32)), jnp.asarray(valid)))
        ref_colors.append(ref_dIs[lvl][..., 0])
    shapes = tuple((calib.h[l], calib.w[l]) for l in range(calib.levels))
    # caps sized for the dense GT maps (every interior pixel valid)
    caps = tuple(h * w for h, w in shapes)
    ref_pc = compact_pc(tuple(ref_maps), ref_dIs, caps)
    return calib, ref_pc, new_dIs


def _track(calib, ref_pc, new_dIs, R0, t0):
    s = Settings()
    shapes = tuple((calib.h[l], calib.w[l]) for l in range(calib.levels))
    Ks = tuple(
        (float(calib.fx[l]), float(calib.fy[l]), float(calib.cx[l]), float(calib.cy[l]))
        for l in range(calib.levels)
    )
    track = jax.jit(make_track_fn(shapes, Ks, s, affine_mode=0))
    return track(
        jnp.asarray(R0, jnp.float32),
        jnp.asarray(t0, jnp.float32),
        jnp.zeros(2, jnp.float32),
        ref_pc,
        tuple(new_dIs),
        jnp.array([1.0, 1.0], jnp.float32),
        jnp.zeros(2, jnp.float32),
    )


class TestCoarseTracker:
    def test_identity_stays(self):
        pose = SE3()
        calib, pc, nd = _setup_pair(pose, pose)
        R, t, ab, res, flow, ok = _track(calib, pc, nd, np.eye(3), np.zeros(3))
        assert bool(ok)
        assert float(res[0]) < 0.5
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-3)

    def test_recovers_translation(self):
        ref = SE3()
        gt_new = SE3.exp([0.06, -0.03, 0.04, 0, 0, 0])  # camToWorld
        calib, pc, nd = _setup_pair(ref, gt_new)
        R, t, ab, res, flow, ok = _track(calib, pc, nd, np.eye(3), np.zeros(3))
        ref_to_new = gt_new.inverse() * ref
        assert bool(ok)
        assert float(res[0]) < 1.0, f"final rmse {res}"
        np.testing.assert_allclose(np.asarray(t), ref_to_new.t, atol=2e-3)

    def test_recovers_rotation_translation(self):
        ref = SE3()
        gt_new = SE3.exp([0.04, 0.02, -0.02, 0.01, -0.015, 0.008])
        calib, pc, nd = _setup_pair(ref, gt_new)
        R, t, ab, res, flow, ok = _track(calib, pc, nd, np.eye(3), np.zeros(3))
        ref_to_new = gt_new.inverse() * ref
        assert bool(ok)
        assert float(res[0]) < 1.0, f"final rmse {res}"
        err = SE3(np.asarray(R, np.float64), np.asarray(t, np.float64)).inverse() * ref_to_new
        assert np.linalg.norm(err.log()) < 5e-3, err.log()

    def test_batched_hypotheses(self):
        ref = SE3()
        gt_new = SE3.exp([0.05, 0.0, 0.02, 0.0, 0.01, 0.0])
        calib, pc, nd = _setup_pair(ref, gt_new)
        s = Settings()
        shapes = tuple((calib.h[l], calib.w[l]) for l in range(calib.levels))
        Ks = tuple(
            (float(calib.fx[l]), float(calib.fy[l]), float(calib.cx[l]), float(calib.cy[l]))
            for l in range(calib.levels)
        )
        track = make_track_fn(shapes, Ks, s, affine_mode=0)
        batched = jax.jit(
            jax.vmap(track, in_axes=(0, 0, 0, None, None, None, None))
        )
        n_hyp = 4
        R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n_hyp, 3, 3))
        t0 = jnp.zeros((n_hyp, 3), jnp.float32)
        ab0 = jnp.zeros((n_hyp, 2), jnp.float32)
        R, t, ab, res, flow, ok = batched(
            R0, t0, ab0, pc, tuple(nd),
            jnp.array([1.0, 1.0], jnp.float32), jnp.zeros(2, jnp.float32),
        )
        assert res.shape == (n_hyp, calib.levels)
        ref_to_new = gt_new.inverse() * ref
        best = int(jnp.argmin(res[:, 0]))
        np.testing.assert_allclose(np.asarray(t[best]), ref_to_new.t, atol=3e-3)


class TestCoarseDepthMaps:
    def test_scatter_and_dilate(self):
        shapes = ((16, 16), (8, 8))
        dIs = tuple(jnp.ones((h, w, 3), jnp.float32) for h, w in shapes)
        pt_u = jnp.array([5.0, 9.0, 5.2])
        pt_v = jnp.array([5.0, 9.0, 5.1])
        pt_id = jnp.array([2.0, 4.0, 2.0])
        pt_w = jnp.array([1.0, 1.0, 1.0])
        pt_valid = jnp.array([True, True, False])
        maps = make_coarse_depth_maps(pt_u, pt_v, pt_id, pt_w, pt_valid, dIs, shapes)
        id0, valid0 = maps[0]
        assert bool(valid0[5, 5])
        np.testing.assert_allclose(float(id0[5, 5]), 2.0, atol=1e-6)
        # dilation fills diagonal neighbor of (5,5)
        assert bool(valid0[6, 6]) or bool(valid0[4, 4])
        # level 1: sum-pooled into (2..3) cell -> normalized back to ~2.0
        id1, valid1 = maps[1]
        assert bool(valid1[2, 2])
        np.testing.assert_allclose(float(id1[2, 2]), 2.0, atol=1e-6)
