"""Compacted epipolar search (trace_points search_bucket) vs the dense path.

With the bucket covering every needs-search point, the compaction matches
the dense path on every field except quality: the dense path runs the
discrete search on early-return points too and applies the reference's
quality-update rule to them (measured better on the 350-frame parity
harness -- the degenerate searches act as an outlier filter), while the
bucket path never searches them and so keeps their quality.  Overflow
points (touched=False) keep their entire state.  The bucket is an opt-in
perf mode (see full_system._trace_kwargs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.frontend import immature as imm
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.ops.pyramid import build_pyramid
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib


def _setup(n=256, seed=0, tight_frac=0.3, oob_frac=0.1):
    rng = np.random.default_rng(seed)
    calib = default_calib(320, 240)
    scene = PlaneScene(calib, z0=3.0)
    img0, idep0 = scene.render(SE3.exp(np.zeros(6)))
    pose1 = SE3.exp(np.array([0.08, 0.01, 0.02, 0.0, 0.004, 0.0]))
    img1, _ = scene.render(pose1)
    dI1 = build_pyramid(jnp.asarray(img1), 1)[0][0]
    dI0 = build_pyramid(jnp.asarray(img0), 1)[0][0]

    u = rng.uniform(8, 312, n).astype(np.float32)
    v = rng.uniform(8, 232, n).astype(np.float32)
    color, w, gradH, ok = imm.make_immature_data(dI0, jnp.asarray(u), jnp.asarray(v))

    # mixed population: fresh (no max), converged-tight (skip), OOB status
    idmin = np.zeros(n, np.float32)
    idmax = np.full(n, np.inf, np.float32)
    status = np.zeros(n, np.int32)
    gt_id = np.asarray(idep0)[
        np.clip(v.astype(int), 0, 239), np.clip(u.astype(int), 0, 319)]
    tight = rng.random(n) < tight_frac
    idmin[tight] = gt_id[tight] * 0.999
    idmax[tight] = gt_id[tight] * 1.001
    status[rng.random(n) < oob_frac] = imm.IPS_OOB
    valid = rng.random(n) < 0.9

    K = calib.K[0]
    w2c = pose1.inverse()
    KRKi = (K @ w2c.R @ np.linalg.inv(K)).astype(np.float32)
    Kt = (K @ w2c.t).astype(np.float32)

    s = Settings()
    kwargs = dict(
        max_pix_search_frac=s.max_pix_search,
        huber_th=s.huber_th, w_img=320, h_img=240,
        n_steps=imm.n_steps_for(320, 240, s.max_pix_search),
    )
    args = (dI1, jnp.asarray(u), jnp.asarray(v), color, w, gradH,
            jnp.asarray(idmin), jnp.asarray(idmax), jnp.asarray(status),
            jnp.ones(n, jnp.float32), jnp.full(n, 1e4, jnp.float32),
            jnp.asarray(KRKi[None]), jnp.asarray(Kt[None]),
            jnp.asarray(np.array([[1.0, 0.0]], np.float32)),
            jnp.zeros(n, jnp.int32))
    return args, kwargs, jnp.asarray(valid)


def test_compact_matches_dense_when_bucket_covers():
    args, kwargs, valid = _setup(tight_frac=0.6, oob_frac=0.2)
    dense = imm.trace_points(*args, valid=valid, **kwargs)
    # bucket 256 == n covers everything -> dense path; use 128 < n with
    # all needs guaranteed under it by construction? safer: bucket = n//2
    # and assert it covered (touched everywhere)
    comp = imm.trace_points(*args, valid=valid, search_bucket=128,
                            rot=jnp.int32(17), **kwargs)
    touched = np.asarray(comp[7])
    assert touched.all(), "setup must leave needs-count under the bucket"
    for i, name in enumerate(
            ("idepth_min", "idepth_max", "status")):
        np.testing.assert_allclose(
            np.asarray(comp[i]), np.asarray(dense[i]), rtol=1e-6, atol=1e-6,
            err_msg=name)
    np.testing.assert_allclose(
        np.asarray(comp[4]), np.asarray(dense[4]), rtol=1e-6, atol=1e-6,
        err_msg="interval")
    # quality: identical exactly on the searched (needs) rows; on
    # early-return rows the bucket path keeps the old value while the
    # dense path applies the reference update rule (module docstring)
    q_in = np.asarray(args[9])
    q_comp, q_dense = np.asarray(comp[3]), np.asarray(dense[3])
    searched = q_comp != q_in
    np.testing.assert_allclose(q_comp[searched], q_dense[searched],
                               rtol=1e-6, atol=1e-6, err_msg="quality")
    assert (q_comp[~searched] == q_in[~searched]).all()


def test_overflow_keeps_state_untouched():
    args, kwargs, valid = _setup(n=256, seed=1)
    tiny = imm.trace_points(*args, valid=valid, search_bucket=16,
                            rot=jnp.int32(0), **kwargs)
    touched = np.asarray(tiny[7])
    assert (~touched).any(), "expected overflow with a 16-slot bucket"
    # untouched rows: trace_update must keep every old field
    idmin_old = np.asarray(args[6])
    trace = dict(idepth_min=args[6], idepth_max=args[7],
                 status=args[8], quality=args[9],
                 interval=jnp.zeros_like(args[6]))
    static = dict(u=args[1], v=args[2], color=args[3], weights=args[4],
                  gradH=args[5], energy_th=args[10], valid=valid)
    out = imm.trace_update(
        static, trace, args[0], args[11], args[12], args[13],
        kwargs["max_pix_search_frac"], huber_th=kwargs["huber_th"],
        w_img=320, h_img=240, F=1, M=256, n_steps=kwargs["n_steps"],
        search_bucket=16, rot=jnp.int32(0))
    keep = ~touched & np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(out["idepth_min"])[keep],
                                  idmin_old[keep])
    np.testing.assert_array_equal(np.asarray(out["status"])[keep],
                                  np.asarray(args[8])[keep])


def test_rotation_varies_served_set():
    args, kwargs, valid = _setup(n=256, seed=2)
    a = imm.trace_points(*args, valid=valid, search_bucket=16,
                         rot=jnp.int32(0), **kwargs)
    b = imm.trace_points(*args, valid=valid, search_bucket=16,
                         rot=jnp.int32(101), **kwargs)
    ta, tb = np.asarray(a[7]), np.asarray(b[7])
    assert (ta != tb).any(), "rotation must change which slots are served"
