import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.geometry import SE3
from nalo_slam_tpu.ops import build_pyramid
from nalo_slam_tpu.parallel import make_mesh, MultiSeqTracker
from nalo_slam_tpu.utils.synthetic import PlaneScene, default_calib


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


@pytest.mark.slow
def test_multiseq_tracks_batch_of_sequences():
    B = 8
    calib = default_calib(160, 120, f=130.0)
    mesh = make_mesh(dp=8, tp=1)
    s = Settings()
    shapes = tuple((calib.h[l], calib.w[l]) for l in range(calib.levels))
    Ks = tuple(
        (float(calib.fx[l]), float(calib.fy[l]), float(calib.cx[l]), float(calib.cy[l]))
        for l in range(calib.levels)
    )
    tracker = MultiSeqTracker(shapes, Ks, s, mesh)

    # B sequences = same scene, different GT motions
    scene = PlaneScene(calib, z0=3.0)
    gts = [SE3.exp(np.array([0.04 + 0.005 * b, 0.01 * b * 0.1, 0.02, 0, 0.004, 0]))
           for b in range(B)]
    ref_img, ref_id = scene.render(SE3())
    ref_dIs, _ = build_pyramid(jnp.asarray(ref_img), calib.levels)
    from nalo_slam_tpu.frontend.tracker import compact_pc
    maps, new_b = [], []
    for lvl in range(calib.levels):
        h, w = calib.h[lvl], calib.w[lvl]
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        valid = (xx >= 2) & (xx < w - 2) & (yy >= 2) & (yy < h - 2)
        idl = ref_id
        for _ in range(lvl):
            idl = 0.25 * (idl[0::2, 0::2] + idl[0::2, 1::2] + idl[1::2, 0::2] + idl[1::2, 1::2])
        maps.append((jnp.asarray(idl.astype(np.float32)), jnp.asarray(valid)))
    caps = tuple(h * w for h, w in shapes)   # dense GT maps: full caps
    pc = compact_pc(tuple(maps), ref_dIs, caps)
    pc_b = tuple(tuple(jnp.broadcast_to(x, (B,) + x.shape) for x in lvl)
                 for lvl in pc)

    new_imgs = [scene.render(g)[0] for g in gts]
    new_pyrs = [build_pyramid(jnp.asarray(im), calib.levels)[0] for im in new_imgs]
    for lvl in range(calib.levels):
        new_b.append(jnp.stack([p[lvl] for p in new_pyrs]))

    R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    t0 = jnp.zeros((B, 3), jnp.float32)
    ab0 = jnp.zeros((B, 2), jnp.float32)
    exps = jnp.ones((B, 2), jnp.float32)
    raff = jnp.zeros((B, 2), jnp.float32)

    R, t, ab, res, flow, ok = tracker.track(
        R0, t0, ab0, pc_b, tuple(new_b), exps, raff
    )
    res = np.asarray(res)
    assert res.shape == (B, calib.levels)
    for b in range(B):
        ref_to_new = gts[b].inverse()  # ref pose is identity
        assert np.asarray(ok)[b]
        np.testing.assert_allclose(np.asarray(t)[b], ref_to_new.t, atol=5e-3)


@pytest.mark.slow
@pytest.mark.parametrize("compact_gn", [False, True])
def test_multiseq_system_end_to_end(compact_gn, monkeypatch):
    """8 synthetic sequences tracked end-to-end (windows + BA per sequence,
    hypothesis-0 descent dp-sharded over the 8-device mesh); per-sequence
    ATE must match the single-sequence quality bound.

    compact_gn=True shrinks the GN bucket floor so the batched keyframe
    path exercises the SHARED-BUCKET active-slot compaction
    (multiseq._batched_keyframes + device_opt.make_device_optimizer_compact),
    which full-size runs use but the small test P otherwise never
    triggers."""
    from nalo_slam_tpu.backend import energy as E
    from nalo_slam_tpu.parallel import MultiSeqSystem
    from nalo_slam_tpu.utils.evaluate import ate_rmse

    if compact_gn:
        monkeypatch.setattr(E, "GN_BUCKET_FLOOR", 256)
    B = 8
    n = 14
    calib = default_calib(240, 180, f=200.0)
    mesh = make_mesh(dp=8, tp=1)
    s = Settings(
        max_window_frames=8, max_points=2048, max_immature_per_frame=512,
        desired_point_density=500.0, desired_immature_density=400.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    scene = PlaneScene(calib, z0=3.0)

    def gt_pose(b, k):
        xi = np.array([
            (0.05 + 0.002 * b) * k, 0.01 * np.sin(0.2 * k + 0.3 * b),
            0.02 * k, 0.0, 0.004 * np.sin(0.15 * k), 0.0,
        ])
        return SE3.exp(xi)

    rng = np.random.default_rng(11)
    frames = [[None] * B for _ in range(n)]
    for k in range(n):
        for b in range(B):
            img, _ = scene.render(gt_pose(b, k))
            frames[k][b] = img + rng.normal(scale=1.2, size=img.shape).astype(np.float32)

    ms = MultiSeqSystem(s, calib, B, mesh)
    for k in range(n):
        ms.add_frames(frames[k], timestamp=float(k), incoming_id=k)

    n_ok = 0
    for b, sysb in enumerate(ms.systems):
        assert sysb.initialized, f"seq {b} never initialized"
        assert not sysb.is_lost, f"seq {b} lost"
        rows = sysb.trajectory()
        est = {int(r[0]): np.array(r[1:4]) for r in rows}
        ks = sorted(est.keys())
        if len(ks) < 4:
            continue
        est_xyz = np.stack([est[k] for k in ks])
        gt_xyz = np.stack([gt_pose(b, k).t for k in ks])
        ate = ate_rmse(est_xyz, gt_xyz, with_scale=True)
        assert ate < 0.06, f"seq {b}: ATE {ate:.4f} m"
        n_ok += 1
    assert n_ok >= 6


@pytest.mark.slow
def test_multiseq_lockstep_dispatch_count_independent_of_B():
    """Per-lockstep device dispatches must not scale with B: the descent,
    deferred immature trace, re-track ladder, point activation, and window
    GN each ride ONE vmapped program for all sequences.  Counted by
    intercepting the per-system dispatch methods after every sequence has
    initialized (init legitimately runs per-system)."""
    from nalo_slam_tpu.parallel import MultiSeqSystem
    from nalo_slam_tpu.system.full_system import FullSystem

    B = 4
    n = 16
    calib = default_calib(240, 180, f=200.0)
    mesh = make_mesh(dp=4, tp=1)
    s = Settings(
        max_window_frames=8, max_points=2048, max_immature_per_frame=512,
        desired_point_density=500.0, desired_immature_density=400.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    scene = PlaneScene(calib, z0=3.0)

    def gt_pose(k):
        xi = np.array([0.05 * k, 0.01 * np.sin(0.2 * k), 0.02 * k,
                       0.0, 0.004 * np.sin(0.15 * k), 0.0])
        # pose jump at k=12 breaks the constant-velocity hypothesis and
        # knocks every sequence off the tracking fast path -> the re-track
        # ladder must batch too
        if k >= 12:
            xi[0] += 0.30
        return SE3.exp(xi)

    rng = np.random.default_rng(11)
    # IDENTICAL sequences -> coincident keyframes every lock-step
    base_frames = []
    for k in range(n):
        img, _ = scene.render(gt_pose(k))
        base_frames.append(
            img + rng.normal(scale=1.2, size=img.shape).astype(np.float32))

    ms = MultiSeqSystem(s, calib, B, mesh)

    counts = {"track": 0, "trace": 0, "retrack": 0, "activate": 0, "gn": 0,
              "batched_trace": 0, "batched_retrack_n": 0,
              "batched_act": 0}
    orig = {
        "track": FullSystem._run_track,
        "trace": FullSystem._dispatch_trace,
        "retrack": FullSystem._run_retrack,
        "activate": FullSystem._activate_dispatch,
    }

    def wrap(name):
        def f(self, *a, **k):
            # _dispatch_trace(None) is a no-op, not a device dispatch
            if not (name == "trace" and a and a[0] is None):
                counts[name] += 1
            return orig[name](self, *a, **k)
        return f

    obt = ms._dispatch_batched_trace
    obr = ms._batched_retrack
    oba = ms._dispatch_batched_activation

    def bt(jobs):
        counts["batched_trace"] += 1
        if len(jobs) == 1:   # single-job fallback uses the per-system path
            counts["trace"] -= 1
        return obt(jobs)

    def br(sink):
        counts["batched_retrack_n"] += len(sink)
        return obr(sink)

    def ba(act):
        counts["batched_act"] += 1
        return oba(act)

    armed = False
    for k in range(n):
        if not armed and all(sy.initialized for sy in ms.systems):
            # steady state reached: from here on, nothing may dispatch
            # per-system
            for nm, fn in (("track", wrap("track")),
                           ("trace", wrap("trace")),
                           ("retrack", wrap("retrack")),
                           ("activate", wrap("activate"))):
                setattr(FullSystem, f"_run_track" if nm == "track" else
                        "_dispatch_trace" if nm == "trace" else
                        "_run_retrack" if nm == "retrack" else
                        "_activate_dispatch", fn)
            ms._dispatch_batched_trace = bt
            ms._batched_retrack = br
            ms._dispatch_batched_activation = ba
            armed = True
        ms.add_frames([base_frames[k]] * B, timestamp=float(k), incoming_id=k)
    try:
        assert armed, "sequences never all initialized"
        for sy in ms.systems:
            assert sy.initialized and not sy.is_lost
        kfs = [sy.statistics["n_keyframes"] for sy in ms.systems]
        assert min(kfs) >= 3, f"too few keyframes to exercise the KF path: {kfs}"
        # per-system dispatches after steady state: NONE
        assert counts["track"] == 0, counts
        assert counts["trace"] == 0, counts
        assert counts["retrack"] == 0, counts
        assert counts["activate"] == 0, counts
        # the batched programs actually ran
        assert counts["batched_trace"] >= 3, counts
        assert counts["batched_act"] >= 1, counts
        assert counts["batched_retrack_n"] >= 2, (
            "brightness shock should have sent every sequence through the "
            f"batched ladder: {counts}")
    finally:
        for nm, fn in orig.items():
            setattr(FullSystem, "_run_track" if nm == "track" else
                    "_dispatch_trace" if nm == "trace" else
                    "_run_retrack" if nm == "retrack" else
                    "_activate_dispatch", fn)


def test_vmapped_window_ba_matches_per_window():
    """Multi-sequence BA as ONE sharded batched GN call: vmap the fused
    device optimizer (backend/device_opt.py) over B independent windows,
    shard the batch over the dp mesh axis, and check each sequence's
    result matches its own unbatched optimize_device run (SURVEY.md §2.4
    scale-out; the reference has no analog)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nalo_slam_tpu.backend import device_opt as D
    from nalo_slam_tpu.backend.energy import _wo_gn_flat
    from test_ba import build_window

    B = 8   # one window per device on the 8-device mesh
    # small perturbation keeps every window well-conditioned: a window on
    # an LM accept/reject boundary amplifies f32 layout jitter into a
    # different (equally valid) descent trajectory, which is convergence
    # chaos rather than a batching defect
    wins = [build_window(n_frames=3, pose_perturb=0.01, seed=s)[0]
            for s in range(B)]
    w0 = wins[0]
    F, Pn = w0.F, w0.P

    # per-window reference results (unbatched fused program); the
    # wrapper raises max_iters to 15 for a 3-frame window
    ref_states = []
    for w in wins:
        w.optimize_device(4)
        ref_states.append(np.stack([f.state for f in w.frames]))

    # rebuild fresh windows with identical inputs for the batched run
    wins2 = [build_window(n_frames=3, pose_perturb=0.01, seed=s)[0]
             for s in range(B)]
    opt = D.make_device_optimizer_fused(w0.s, F, Pn)

    def flat_inputs(w):
        states0 = np.zeros((F, 10), np.float32)
        f_eth0 = np.zeros(F, np.float32)
        for i, f in enumerate(w.frames):
            states0[i] = f.state
            f_eth0[i] = f.frame_energy_th
        return _wo_gn_flat(w, states0, f_eth0)

    images_b = jnp.stack([w.images for w in wins2])
    jstore_b = {k: jnp.stack([w.jstore[k] for w in wins2])
                for k in wins2[0].jstore}
    pairs = [flat_inputs(w) for w in wins2]
    flat_b = jnp.stack([jnp.asarray(fl) for fl, _ in pairs])
    u8_b = jnp.stack([jnp.asarray(u8) for _, u8 in pairs])
    from nalo_slam_tpu.backend.energy import _wo_pts_static
    stat_list = [_wo_pts_static(w) for w in wins2]
    stat_b = {k: jnp.stack([st[k] for st in stat_list]) for k in stat_list[0]}
    re_b = jnp.stack([jnp.asarray(w.pts.r_energy) for w in wins2])

    batched = jax.vmap(opt.flat, in_axes=(0, 0, 0, 0, 0, 0, None, None))
    devs = np.array(jax.devices())
    mesh = Mesh(devs.reshape(len(devs)), ("dp",))
    shard = NamedSharding(mesh, P("dp"))
    images_b = jax.device_put(images_b, shard)
    flat_b = jax.device_put(flat_b, shard)
    out = batched(images_b, jstore_b, flat_b, u8_b, stat_b, re_b,
                  jnp.int32(15), jnp.int32(2))
    flat_out = np.asarray(out["flat"])

    n_small = 6 + F + 10 * F
    for b in range(B):
        small = flat_out[b, :n_small]
        states = small[6 + F:].reshape(F, 10)
        # same optimization outcome as the per-window run (f32 tolerance)
        np.testing.assert_allclose(states[:3, :8], ref_states[b][:3, :8],
                                   rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_multiseq_auto_fallback_probe():
    """Never-worse guard: with B > mesh size the system A/B-probes both
    execution modes after initialization and commits to the faster one;
    either choice must leave every sequence healthy."""
    from nalo_slam_tpu.parallel import MultiSeqSystem

    B = 2
    n = 26
    calib = default_calib(240, 180, f=200.0)
    mesh = make_mesh(dp=1, tp=1)   # oversubscribed: 2 sequences, 1 element
    s = Settings(
        max_window_frames=8, max_points=2048, max_immature_per_frame=512,
        desired_point_density=500.0, desired_immature_density=400.0,
        use_lidar=False, dense_track=False, plane_optimize=False,
    )
    scene = PlaneScene(calib, z0=3.0)

    def gt_pose(b, k):
        xi = np.array([(0.05 + 0.002 * b) * k, 0.01 * np.sin(0.2 * k + 0.3 * b),
                       0.02 * k, 0.0, 0.004 * np.sin(0.15 * k), 0.0])
        return SE3.exp(xi)

    rng = np.random.default_rng(5)
    ms = MultiSeqSystem(s, calib, B, mesh)
    assert ms._probe is not None   # oversubscribed -> probe armed
    for k in range(n):
        imgs = []
        for b in range(B):
            img, _ = scene.render(gt_pose(b, k))
            imgs.append(img + rng.normal(scale=1.2, size=img.shape)
                        .astype(np.float32))
        ms.add_frames(imgs, timestamp=float(k), incoming_id=k)
    assert ms._probe is None, "probe never resolved"
    assert ms.lockstep_mode in ("batched(auto)", "sequential(auto)")
    if ms.lockstep_mode == "sequential(auto)":
        assert ms.tracker is None
    for b, sysb in enumerate(ms.systems):
        assert sysb.initialized and not sysb.is_lost, f"seq {b} unhealthy"
