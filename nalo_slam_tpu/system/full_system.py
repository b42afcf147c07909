"""FullSystem: the per-frame SLAM orchestrator.

Rebuild of FullSystem (reference: src/FullSystem/FullSystem.cpp) driving the
TPU-native components:

  addActiveFrame (:1034)  -> add_frame
  trackNewCoarse (:502)   -> _track_new_coarse (fast path: hypothesis 0 only,
                             :655 break; fallback: ALL hypotheses batched in
                             one vmapped pyramid descent)
  makeKeyFrame (:1279)    -> _make_keyframe
  makeNonKeyFrame (:1265) -> _make_non_keyframe
  traceNewCoarse (:702)   -> one batched trace_points call over every
                             immature point of every window frame
  activatePointsMT (:764) -> distance-map gating + batched activate_points
  flagFramesForMarginalization (FullSystemMarginalize.cpp:58)
  flagPointsForRemoval (:937)
  initializeFromInitializer (:1567)

This round runs the reference's `linearizeOperation` (sequential) mode; the
track||map thread pipeline is layered on top in system/pipeline.py.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

import numpy as np
import jax.numpy as jnp

from ..config import PATTERN, Settings
from ..geometry import SE3, PyramidCalib
from ..ops import build_pyramid
from ..backend.energy import WindowOptimizer
from ..backend.window import FrameState, RES_IN, RES_OOB, RES_OUTLIER, RES_NONE
from ..frontend.initializer import CoarseInitializer
from ..frontend.pixel_selector import PixelSelector
from ..frontend.tracker import (make_track_fn, make_coarse_depth_maps,
                                compact_pc, pc_caps_for, aff_from_to)
from ..frontend import immature as imm
from ..nalo.dense_frontend import GroundState, dense_frontend_update
from ..utils.metrics import MetricsLogger
from ..nalo.plane_opt import GlobalPlane, plane_optimize, sw_gray_optimize
from ..nalo import dense_map as dmap

import jax
import threading

# sentinel returned by track_only when a multi-sequence executor parked the
# re-track ladder for batched dispatch (resume via _retrack_adopt)
RETRACK_PENDING = object()


def _host_immature_data(dI0: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Numpy twin of immature.make_immature_data, fed from the host
    selector pyramid: pattern colors, gradient weights, gradH, ok.  Keeps
    new-trace creation free of device pulls (the device store gets the
    same values via one async upload)."""
    pat = np.asarray(PATTERN, np.float32)
    up = u[:, None] + pat[None, :, 0]
    vp = v[:, None] + pat[None, :, 1]
    H, W, _ = dI0.shape
    x0 = np.floor(up).astype(np.int64)
    y0 = np.floor(vp).astype(np.int64)
    dx = (up - x0).astype(np.float32)
    dy = (vp - y0).astype(np.float32)
    x0c = np.clip(x0, 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    y0c = np.clip(y0, 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    samp = (dI0[y0c, x0c] * ((1 - dx) * (1 - dy))[..., None]
            + dI0[y0c, x1] * (dx * (1 - dy))[..., None]
            + dI0[y1, x0c] * ((1 - dx) * dy)[..., None]
            + dI0[y1, x1] * (dx * dy)[..., None])
    color = samp[..., 0]
    g = samp[..., 1:]
    gradH = np.einsum("nki,nkj->nij", g, g)
    w = np.sqrt(2500.0 / (2500.0 + np.sum(g * g, axis=-1))).astype(np.float32)
    ok = np.all(np.isfinite(color), axis=-1)
    return color.astype(np.float32), w, gradH.astype(np.float32), ok


def _host_selector_pyramid(img: np.ndarray, b_grad: np.ndarray | None):
    """Numpy levels 0-2 intensity+gradient+absgrad for the pixel selector
    (same math as ops.pyramid.build_pyramid)."""
    dIs = []
    ags = []
    cur = img.astype(np.float32)
    for lvl in range(3):
        if lvl > 0:
            h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
            cur = 0.25 * (cur[0:2*h2:2, 0:2*w2:2] + cur[0:2*h2:2, 1:2*w2:2]
                          + cur[1:2*h2:2, 0:2*w2:2] + cur[1:2*h2:2, 1:2*w2:2])
        dx = np.zeros_like(cur)
        dy = np.zeros_like(cur)
        dx[:, 1:-1] = 0.5 * (cur[:, 2:] - cur[:, :-2])
        dy[1:-1, :] = 0.5 * (cur[2:, :] - cur[:-2, :])
        ag = dx * dx + dy * dy
        if b_grad is not None:
            gw = b_grad[np.clip(cur.astype(np.int32), 0, 255)]
            ag = ag * gw * gw
        dIs.append(np.stack([cur, dx, dy], axis=-1))
        ags.append(ag)
    return dIs[0], ags


class _AsyncHost:
    """Run a host-side job (the pixel selector) in a worker thread so it
    overlaps the keyframe's device round trips (activation + window GN).
    numpy releases the GIL inside its array kernels, so the selector makes
    real progress while the mapping thread blocks in a device pull."""

    def __init__(self, fn):
        self._exc = None
        self._res = None
        self._th = threading.Thread(target=self._run, args=(fn,), daemon=True)
        self._th.start()

    def _run(self, fn):
        try:
            self._res = fn()
        except BaseException as e:  # surfaced at get()
            self._exc = e

    def get(self):
        self._th.join()
        if self._exc is not None:
            raise self._exc
        return self._res


def _nt_result(x):
    """nt_pre entries are either a raw host-selection tuple or an
    _AsyncHost handle."""
    return x.get() if isinstance(x, _AsyncHost) else x


def compute_marg_flags(in_pts, out_pts, log_rel_a, frame_ids, dists, s):
    """flagFramesForMarginalization decision rule as a pure function
    (reference FullSystemMarginalize.cpp:58-147).

    in_pts[i]:    live points of frame i (active + immature)
    out_pts[i]:   lifetime marginalized + dropped points hosted by frame i
    log_rel_a[i]: |log| relative affine brightness factor to the latest KF
    dists[i, j]:  translation distance between frames i and j
    Returns a list of bools (True = marginalize).
    """
    n = len(in_pts)
    flags = [False] * n
    flagged = 0
    # Rule 1 (:72-106): not enough points remaining, or brightness gap.
    for i in range(n):
        if ((in_pts[i] < s.min_points_remaining * (in_pts[i] + out_pts[i])
             or log_rel_a[i] > s.max_log_aff_fac_in_window)
                and n - flagged > s.min_frames):
            flags[i] = True
            flagged += 1
    # Rule 2 (:107-147): window still full -> max-distance-score frame.
    if n - flagged >= s.max_frames:
        smallest = 1.0
        to_marg = None
        latest_id = frame_ids[-1]
        for i in range(n):
            if frame_ids[i] > latest_id - s.min_frame_age or frame_ids[i] == 0:
                continue
            dist_score = 0.0
            for j in range(n):
                # targets newer than latest - minFrameAge + 1 are excluded
                # (at the default minFrameAge=1 the latest itself stays in)
                if frame_ids[j] > latest_id - s.min_frame_age + 1 or j == i:
                    continue
                dist_score += 1.0 / (1e-5 + dists[i][j])
            dist_score *= -np.sqrt(dists[i][n - 1])
            if dist_score < smallest:
                smallest = dist_score
                to_marg = i
        if to_marg is not None:
            flags[to_marg] = True
    return flags


class FrameShell:
    """Pose record per frame (reference src/util/FrameShell.h:37-77)."""

    def __init__(self, fid: int, incoming_id: int, timestamp: float):
        self.id = fid
        self.incoming_id = incoming_id
        self.timestamp = timestamp
        self.camToWorld = SE3()
        self.aff_g2l = (0.0, 0.0)
        self.trackingRef: "FrameShell | None" = None
        self.camToTrackingRef = SE3()
        self.poseValid = True
        self.marginalizedAt = -1


class ImmatureStore:
    """Padded immature-point arrays for one keyframe."""

    def __init__(self, M: int):
        self.M = M
        self.valid = np.zeros(M, bool)
        self.u = np.zeros(M, np.float32)
        self.v = np.zeros(M, np.float32)
        self.color = np.zeros((M, 8), np.float32)
        self.weights = np.zeros((M, 8), np.float32)
        self.gradH = np.zeros((M, 2, 2), np.float32)
        self.idepth_min = np.zeros(M, np.float32)
        self.idepth_max = np.full(M, np.nan, np.float32)
        self.quality = np.full(M, 10000.0, np.float32)
        self.status = np.full(M, imm.IPS_UNINITIALIZED, np.int32)
        self.pixel_interval = np.zeros(M, np.float32)
        self.my_type = np.ones(M, np.float32)
        self.energy_th = np.zeros(M, np.float32)


class FullSystem:
    def __init__(self, settings: Settings, calib: PyramidCalib, gamma_b_grad=None,
                 metrics: MetricsLogger | None = None):
        self.s = settings
        self.calib = calib
        # observability (reference printLogLine + log streams,
        # FullSystem.cpp:76-121,1707-1751): per-KF structured record with a
        # stage-ms breakdown, per-frame track/map timing
        self.metrics = metrics if metrics is not None else MetricsLogger()
        self._stage_ms: dict = {}
        self.gamma_b_grad = (
            jnp.asarray(gamma_b_grad, jnp.float32) if gamma_b_grad is not None else None
        )
        self.gamma_b_grad_np = (
            np.asarray(gamma_b_grad, np.float32) if gamma_b_grad is not None else None
        )
        h0, w0 = calib.h[0], calib.w[0]
        self.window = WindowOptimizer(settings, calib.value_vec(), (h0, w0))
        self.initializer = CoarseInitializer(calib, settings)
        self.selector = PixelSelector(w0, h0, settings)
        self.initialized = False
        self.is_lost = False
        self.init_failed = False
        self.all_shells: list[FrameShell] = []
        self.all_kf_shells: list[FrameShell] = []
        self.immatures: list[ImmatureStore] = []   # parallel to window.frames
        self.frame_pyramids = {}                    # window idx -> (dIs, absgrads)
        self.current_min_act_dist = 2.0
        self.first_coarse_rmse = -1.0
        self.last_coarse_rmse = np.full(calib.levels, 100.0)
        self.tracker_ref = None
        self._track_fns = {}
        self.statistics = dict(n_keyframes=0, n_frames=0, n_points_activated=0)
        self.shapes = tuple((calib.h[l], calib.w[l]) for l in range(calib.levels))
        self.Ks = tuple(
            (float(calib.fx[l]), float(calib.fy[l]), float(calib.cx[l]), float(calib.cy[l]))
            for l in range(calib.levels)
        )
        self.imm_static, self.imm_trace = imm.empty_device_state(
            settings.max_window_frames, settings.max_immature_per_frame
        )
        self.output_wrappers: list = []
        # pose-consistency lock (reference shellPoseMutex, FullSystem.h:322)
        self.shell_lock = threading.Lock()
        self.window.shell_lock = self.shell_lock
        self._marg_points: dict = {}   # kf frame_id -> [(n,3) u,v,idepth]
        # deferred immature-trace dispatch (see flush_pending_trace)
        self._pending_trace = None
        self._trace_dispatch_lock = threading.Lock()
        # NALO extensions: ground/scale state, per-KF masks, dense maps
        self.ground_state = GroundState()
        self.global_plane = GlobalPlane()
        self.kf_masks: list = []      # parallel to window.frames
        self.kf_images: list = []     # host intensity per KF
        self.kf_bgr: list = []
        self.dense_maps: dict = {}    # kf frame_id -> MapPointCloud
        self.tsdf_volume = None
        self._dense_max = 4096
        # static caps of the compact tracker pc buffers (tracker.compact_pc)
        self._pc_caps = pc_caps_for(
            self.shapes, settings,
            self._dense_max if settings.dense_track else 0)
        am = (settings.affine_opt_mode_a < 0, settings.affine_opt_mode_b < 0)
        self._affine_mode = {(False, False): 0, (False, True): 1,
                             (True, False): 2, (True, True): 3}[am]

    # ==================================================================
    def precompile(self):
        """Front-load every XLA compile / persistent-cache load the
        runtime will hit.  First-encounter costs are seconds each on the
        bench device and otherwise land mid-run: the first frame
        marginalization (~6th keyframe), a fresh activation pad bucket
        whenever the candidate count crosses a power of two, the first
        point marginalization.  All shapes are fixed at construction, so
        dummy zero inputs trace the exact programs the run will use."""
        s = self.s
        c = self.calib
        F, M, P = self.window.F, s.max_immature_per_frame, self.window.P
        f32 = jnp.float32
        h0, w0 = c.h[0], c.w[0]
        h1, w1 = c.h[1], c.w[1]
        L = c.levels
        self.window.precompile()
        outs = []
        # immature trace + activation prep (fixed shapes)
        outs.append(imm.trace_update(
            self.imm_static, self.imm_trace, self.window.images[0],
            jnp.zeros((F, 3, 3), f32), jnp.zeros((F, 3), f32),
            jnp.zeros((F, 2), f32), s.max_pix_search,
            huber_th=s.huber_th, w_img=w0, h_img=h0, F=F, M=M,
            **self._trace_kwargs()))
        # the fused single-call activation (prep + greedy + idepth LM)
        out_act = imm.activation_run(
            self.imm_static, self.imm_trace, self.window.images,
            jnp.zeros(P, f32), jnp.zeros(P, f32), jnp.zeros(P, f32),
            jnp.zeros(P, jnp.int32), jnp.zeros(P, bool),
            jnp.zeros((F, 3, 3), f32), jnp.zeros((F, 3), f32),
            jnp.zeros(F, bool), jnp.int32(0),
            s.min_trace_quality, jnp.float32(2.0),
            jnp.zeros((F, F, 3, 3), f32), jnp.zeros((F, F, 3), f32),
            jnp.zeros((F, F, 2), f32), jnp.zeros(F, bool),
            jnp.asarray(self.window.calib_value, f32), s.min_idepth_h_act,
            F=F, M=M, C=4096, A=2048, h1=h1, w1=w1, dm_iters=40,
            iters=s.gn_its_on_point_activation, huber_th=s.huber_th,
            w_img=w0, h_img=h0, images_quad=self.window.quads)
        outs.append(out_act[0])
        if s.use_device_opt and s.overlap_activation:
            # the overlapped keyframe path's GN-with-activation-merge
            # programs (one per compaction bucket + the full-P variant):
            # without this warm they compile at first use MID-RUN -- tens
            # of seconds each on the tunneled device -- which is exactly
            # the stall class precompile exists to prevent
            from ..backend import device_opt as D
            from ..backend.energy import (_gn_bucket_ladder, _wo_gn_flat,
                                          _wo_pts_static)
            w_ = self.window
            Pw = w_.P
            act_flat0 = out_act[0]
            imm0 = {k: self.imm_static[k]
                    for k in ("u", "v", "color", "weights", "energy_th")}
            A = self._ACT_A
            z10 = np.zeros((F, 10), np.float32)
            zF = np.zeros(F, np.float32)
            rE = jnp.zeros((Pw, F), f32)
            fl0, u80 = _wo_gn_flat(w_, z10, zF)
            fn = D.make_gn_with_activation(s, F, Pw, M)
            outs.append(fn(w_.images, w_.jstore, jnp.asarray(fl0),
                           jnp.asarray(u80), _wo_pts_static(w_), rE,
                           jnp.int32(1), jnp.int32(0), w_.quads,
                           act_flat0, imm0, jnp.full(A, Pw, jnp.int32)))
            rows0 = np.zeros(0, np.int64)
            for b in _gn_bucket_ladder(Pw):
                flc, u8c = _wo_gn_flat(w_, z10, zF, rows0, b)
                fnb = D.make_gn_with_activation(s, F, Pw, M, b)
                outs.append(fnb(
                    w_.images, w_.jstore, jnp.asarray(flc),
                    jnp.asarray(u8c), jnp.full(b, Pw, jnp.int32),
                    _wo_pts_static(w_), rE, jnp.int32(1), jnp.int32(0),
                    w_.quads, act_flat0, imm0,
                    jnp.full(A, b, jnp.int32)))
        # immature-store maintenance programs
        st = ImmatureStore(M)
        new_static = dict(
            u=jnp.asarray(st.u), v=jnp.asarray(st.v),
            color=jnp.asarray(st.color), weights=jnp.asarray(st.weights),
            gradH=jnp.asarray(st.gradH), energy_th=jnp.asarray(st.energy_th),
            my_type=jnp.asarray(st.my_type), valid=jnp.asarray(st.valid))
        new_trace = dict(
            idepth_min=jnp.asarray(st.idepth_min),
            idepth_max=jnp.asarray(st.idepth_max),
            status=jnp.asarray(st.status), quality=jnp.asarray(st.quality),
            interval=jnp.asarray(st.pixel_interval))
        outs.append(imm.set_block(self.imm_static, self.imm_trace,
                                  jnp.int32(0), new_static, new_trace, M))
        outs.append(imm.set_valid(self.imm_static,
                                  jnp.zeros(F * M, bool)))
        outs.append(imm.pack_for_host(self.imm_static, self.imm_trace))
        perm = np.array(list(range(F)))
        outs.append(imm.shift_down(self.imm_static, self.imm_trace,
                                   jnp.asarray(perm), F, M))
        # tracker reference + coarse descent (fast path, triage, winner)
        dIs = tuple(jnp.zeros((c.h[l], c.w[l], 3), f32) for l in range(L))
        Nd = P + self._dense_max
        maps = make_coarse_depth_maps(
            jnp.zeros(Nd, f32), jnp.zeros(Nd, f32), jnp.zeros(Nd, f32),
            jnp.zeros(Nd, f32), jnp.zeros(Nd, bool), dIs, self.shapes)
        outs.append(maps)
        pc = compact_pc(tuple(maps), dIs, self._pc_caps)
        outs.append(pc)
        exps = jnp.ones(2, f32)
        raff = jnp.zeros(2, f32)
        eye = jnp.eye(3, dtype=f32)
        fn0 = self._get_track_fn(False, 0)
        packed0 = fn0(eye, jnp.zeros(3, f32), jnp.zeros(2, f32),
                      pc, dIs, exps, raff)
        outs.append(packed0)
        nh = 31   # _motion_hypotheses always yields 5 + 26 candidates
        fnr = self._get_retrack_fn()
        outs.append(fnr(jnp.broadcast_to(eye, (nh, 3, 3)).copy(),
                        jnp.zeros((nh, 3), f32), jnp.zeros((nh, 2), f32),
                        pc, dIs, exps, raff, packed0))
        jax.block_until_ready(outs)

    # ==================================================================
    # Frame entry point (addActiveFrame :1034)
    # ==================================================================
    def prepare_frame(self, image, exposure: float = 1.0, timestamp: float = 0.0,
                      incoming_id: int = -1, mask=None, bgr=None) -> dict:
        """Shell + device pyramid for an incoming frame."""
        shell = FrameShell(len(self.all_shells), incoming_id, timestamp)
        self.all_shells.append(shell)
        self.statistics["n_frames"] += 1
        image = np.asarray(image, np.float32)
        # push the image as f16: halves the per-frame H2D bytes on the
        # link; build_pyramid casts back to f32 on device.  Quantization
        # (<=0.125 grey levels below 256) is far under the sensor noise.
        dIs, absgrads = build_pyramid(
            jnp.asarray(image.astype(np.float16)), self.calib.levels,
            self.gamma_b_grad
        )
        return dict(shell=shell, dIs=dIs, absgrads=absgrads, image=image,
                    exposure=exposure, mask=mask, bgr=bgr)

    def set_mask_predictor(self, predictor):
        """Online MP-mask source: when set and no mask PNG accompanies a
        frame, the BTS net generates the prior on-device (SURVEY.md §7
        phase 6 -- mask fused into the frontend instead of loaded from
        disk)."""
        self._mask_predictor = predictor

    def add_frame(self, image, exposure: float = 1.0, timestamp: float = 0.0,
                  incoming_id: int = -1, mask=None, bgr=None):
        if self.is_lost:
            return
        if (mask is None and self.s.use_lidar
                and getattr(self, "_mask_predictor", None) is not None):
            mask = self._mask_predictor.predict_mask(np.asarray(image))
        frame = self.prepare_frame(image, exposure, timestamp, incoming_id, mask, bgr)
        shell = frame["shell"]

        if not self.initialized:
            if self.initializer.frame_id < 0:
                self.initializer.set_first(frame["dIs"], frame["absgrads"], exposure)
                self._init_first_frame = frame
            elif self.initializer.track_frame(frame["dIs"], exposure):
                self._initialize_from_initializer(frame)
            else:
                shell.poseValid = False
            return

        t0 = time.perf_counter()
        need_kf = self.track_only(frame)
        self.metrics.frame(1000.0 * (time.perf_counter() - t0), bool(need_kf))
        if need_kf is None:
            return
        for ow in self.output_wrappers:
            try:
                ow.publish_cam_pose(shell, self.calib)
                if getattr(ow, "wants_live_frame", False):
                    ow.push_live_frame(frame["image"])
            except Exception:
                pass
        self.map_frame(frame, need_kf)

    def track_only(self, frame, packed0=None, pre=None, retrack_sink=None):
        """Tracking-thread half: coarse track + KF decision.  Returns
        need_kf, or None when tracking failed (isLost).  packed0/pre let a
        batched multi-sequence executor inject the hypothesis-0 descent
        result computed in one sharded call; retrack_sink, when given,
        defers a needed re-track ladder to the executor (which batches the
        ladders of every sequence into one program) and returns
        RETRACK_PENDING (parallel/multiseq.py)."""
        tres = self._track_new_coarse(frame, packed0=packed0, pre=pre,
                                      retrack_sink=retrack_sink)
        if tres is RETRACK_PENDING:
            return RETRACK_PENDING
        return self._kf_decision(frame, tres)

    def _kf_decision(self, frame, tres):
        shell = frame["shell"]
        if not np.all(np.isfinite(tres)):
            self.is_lost = True
            return None
        s = self.s
        if s.keyframes_per_second > 0:
            # fixed-rate KF rule (reference FullSystem.cpp:1114-1117)
            last_kf_t = self.window.frames[-1].shell.timestamp if self.window.frames else 0.0
            return bool(
                len(self.all_shells) == 1
                or (shell.timestamp - last_kf_t) > 0.95 / s.keyframes_per_second
            )
        ref = self.tracker_ref
        w0, h0 = self.calib.w[0], self.calib.h[0]
        rel_a, _ = self._aff_pair(ref["exposure"], frame["exposure"],
                                  ref["aff"], shell.aff_g2l)
        return bool(
            len(self.all_shells) == 1
            or s.kf_global_weight * s.max_shift_weight_t * np.sqrt(tres[1]) / (w0 + h0)
            + s.kf_global_weight * s.max_shift_weight_rt * np.sqrt(tres[2]) / (w0 + h0)
            + s.kf_global_weight * s.max_affine_weight * abs(np.log(rel_a)) > 1
            or 2 * self.first_coarse_rmse < tres[0]
        )

    def map_frame(self, frame, need_kf: bool):
        """Mapping-thread half (deliverTrackedFrame sequential mode)."""
        if need_kf:
            self._make_keyframe(frame)
        else:
            self._make_non_keyframe(frame)

    def discard_frame(self, frame):
        """Catch-up path: pose-only bookkeeping, frame dropped
        (reference mappingLoop :1209-1230)."""
        shell = frame["shell"]
        if shell.trackingRef is not None:
            shell.camToWorld = shell.trackingRef.camToWorld * shell.camToTrackingRef

    @contextmanager
    def _stage(self, name: str):
        """Accumulate host-blocking wall time per keyframe stage."""
        t0 = time.perf_counter()
        yield
        self._stage_ms[name] = (
            self._stage_ms.get(name, 0.0) + 1000.0 * (time.perf_counter() - t0)
        )

    @staticmethod
    def _aff_pair(exp_f, exp_t, aff_f, aff_t):
        ef = exp_f if exp_f > 0 else 1.0
        et = exp_t if exp_t > 0 else 1.0
        a = np.exp(aff_t[0] - aff_f[0]) * et / ef
        return a, aff_t[1] - a * aff_f[1]

    # ==================================================================
    # Initialization (initializeFromInitializer :1567)
    # ==================================================================
    def _initialize_from_initializer(self, new_frame):
        ini = self.initializer
        s = self.s
        first = self._init_first_frame
        fs = FrameState(0, first["shell"], first["exposure"], s)
        fs.set_eval_pt_scaled(SE3(), 0.0, 0.0)
        self.all_kf_shells.append(first["shell"])
        self.window.insert_frame(fs, first["dIs"][0])
        self.immatures.append(ImmatureStore(s.max_immature_per_frame))
        self.frame_pyramids[id(fs)] = (first["dIs"], first["absgrads"])
        self.kf_masks.append(first.get("mask"))
        self.kf_images.append(first.get("image"))
        self.kf_bgr.append(first.get("bgr"))

        d = ini.pts[0]
        n = d["n"]
        good = d["valid"][:n]
        iR = d["iR"][:n]
        rescale = 1.0 / max(float(iR[good].mean()), 1e-6)
        keep_pct = s.desired_point_density / max(n, 1)
        rng = np.random.default_rng(s.seed)
        keep = good & (rng.random(n) <= keep_pct)
        u = d["u"][:n][keep] + 0.5
        v = d["v"][:n][keep] + 0.5
        # fixed-size padded call (compile once)
        M0 = s.max_immature_per_frame
        nn = min(len(u), M0)
        u, v = u[:nn], v[:nn]
        up = np.zeros(M0, np.float32)
        vp = np.zeros(M0, np.float32)
        up[:nn] = u
        vp[:nn] = v
        col, wgt, _, ok = imm.make_immature_data(
            first["dIs"][0], jnp.asarray(up), jnp.asarray(vp)
        )
        col = np.asarray(col)[:nn]
        wgt = np.asarray(wgt)[:nn]
        ok = np.asarray(ok)[:nn]
        keep = keep.copy()
        idepth = (iR[keep][:nn] * rescale).astype(np.float32)
        eth = np.full(len(u), 8 * s.outlier_th * s.overall_energy_th_weight**2, np.float32)
        sel = ok & np.isfinite(idepth)
        slots = self.window.insert_points(
            0, u[sel], v[sel], col[sel], wgt[sel], idepth[sel], eth[sel],
            my_type=d["my_type"][:n][keep][:nn][sel], has_prior=True,
        )

        first_to_new = SE3(ini.this_to_next.R, ini.this_to_next.t / rescale)
        first["shell"].camToWorld = SE3()
        first["shell"].aff_g2l = (0.0, 0.0)
        new_frame["shell"].camToWorld = first_to_new.inverse()
        new_frame["shell"].aff_g2l = (0.0, 0.0)
        new_frame["shell"].trackingRef = first["shell"]
        new_frame["shell"].camToTrackingRef = first_to_new.inverse()
        self.initialized = True
        self._make_keyframe(new_frame)

    # ==================================================================
    # Coarse tracking (trackNewCoarse :502)
    # ==================================================================
    def _motion_hypotheses(self, ref=None):
        """The 27-candidate ladder (:516-580)."""
        shells = self.all_shells
        ref_shell = (ref or self.tracker_ref)["shell"]
        if len(shells) < 3:
            return [SE3()]
        slast = shells[-2]
        sprelast = shells[-3]
        if not (slast.poseValid and sprelast.poseValid and ref_shell.poseValid):
            return [SE3()]
        slast_2_sprelast = sprelast.camToWorld.inverse() * slast.camToWorld
        lastF_2_slast = slast.camToWorld.inverse() * ref_shell.camToWorld
        fh_2_slast = slast_2_sprelast
        const = fh_2_slast.inverse() * lastF_2_slast
        tries = [
            const,
            fh_2_slast.inverse() * fh_2_slast.inverse() * lastF_2_slast,
            SE3.exp(fh_2_slast.log() * 0.5).inverse() * lastF_2_slast,
            lastF_2_slast,
            SE3(),
        ]
        rd = 0.02
        for sx in (rd, -rd, 0):
            for sy in (rd, -rd, 0):
                for sz in (rd, -rd, 0):
                    if sx == sy == sz == 0:
                        continue
                    tries.append(const * SE3.rot_xyzw(sx, sy, sz, 1.0))
        return tries

    def _get_track_fn(self, batched: bool, min_level: int = 0):
        key = (batched, min_level)
        if key not in self._track_fns:
            base = make_track_fn(self.shapes, self.Ks, self.s, self._affine_mode,
                                 min_level=min_level)

            def packed(*args):
                R, t, ab, res, flow, ok = base(*args)
                # single flat output -> ONE host pull per track call
                return jnp.concatenate([
                    R.reshape(-1), t, ab, res, flow,
                    ok.astype(jnp.float32)[None],
                ])

            if batched:
                fn = jax.jit(jax.vmap(packed, in_axes=(0, 0, 0, None, None, None, None, None)))
            else:
                fn = jax.jit(packed)
            self._track_fns[key] = fn
        return self._track_fns[key]

    def _unpack_track(self, out):
        L = self.calib.levels
        R = out[..., :9].reshape(out.shape[:-1] + (3, 3))
        t = out[..., 9:12]
        ab = out[..., 12:14]
        res = out[..., 14:14 + L]
        flow = out[..., 14 + L:16 + L]
        ok = out[..., 16 + L] > 0.5
        return R, t, ab, res, flow, ok

    def _run_track(self, R0s, t0s, ab0s, new_dIs, batched: bool, min_level: int = 0,
                   ref=None):
        ref = ref if ref is not None else self.tracker_ref
        exps = jnp.asarray([ref["exposure"], self._cur_exposure], jnp.float32)
        ref_aff = jnp.asarray(ref["aff"], jnp.float32)
        fn = self._get_track_fn(batched, min_level)
        return fn(R0s, t0s, ab0s, ref["pc"], new_dIs, exps, ref_aff)

    def _get_retrack_fn(self):
        """The whole re-track ladder as ONE program: batched coarse triage
        of all 31 hypotheses, full descent on the top-3 triage candidates,
        winner = best LEVEL-0 residual among those full descents AND the
        already-computed fast-path h0 descent.  This mirrors the reference's
        best-of-full-descents selection (FullSystem.cpp:599-656: each try is
        a full pyramid descent, the winner is the best lastResiduals[0]) --
        a coarse-level argmin alone can crown a hypothesis (e.g. the
        zero-motion-from-KF try) that loses at full resolution.
        Output = packed winner + [ok&had, had] flags."""
        key = ("retrack",)
        if key not in self._track_fns:
            ml = min(2, self.calib.levels - 1)
            coarse = make_track_fn(self.shapes, self.Ks, self.s,
                                   self._affine_mode, min_level=ml)
            full = make_track_fn(self.shapes, self.Ks, self.s,
                                 self._affine_mode, min_level=0)
            TOPK = 3

            def retrack(Rs, ts, abs_, ref_pc, new_dIs, exps,
                        ref_aff, packed_h0):
                Rb, tb, abb, resb, _fl, okb = jax.vmap(
                    coarse, in_axes=(0, 0, 0, None, None, None, None)
                )(Rs, ts, abs_, ref_pc, new_dIs, exps, ref_aff)
                score = jnp.where(okb & jnp.isfinite(resb[:, ml]),
                                  resb[:, ml], jnp.inf)
                _, topi = jax.lax.top_k(-score, TOPK)
                Rk, tk, abk, resk, flowk, okk = jax.vmap(
                    full, in_axes=(0, 0, 0, None, None, None, None)
                )(Rb[topi], tb[topi], abb[topi], ref_pc,
                  new_dIs, exps, ref_aff)
                # fast-path h0 full-descent result as the (TOPK+1)-th candidate
                L = resk.shape[-1]
                R0 = packed_h0[:9].reshape(3, 3)
                t0 = packed_h0[9:12]
                ab0 = packed_h0[12:14]
                res0 = packed_h0[14:14 + L]
                flow0 = packed_h0[14 + L:16 + L]
                ok0 = packed_h0[16 + L] > 0.5
                Rk = jnp.concatenate([Rk, R0[None]], 0)
                tk = jnp.concatenate([tk, t0[None]], 0)
                abk = jnp.concatenate([abk, ab0[None]], 0)
                resk = jnp.concatenate([resk, res0[None]], 0)
                flowk = jnp.concatenate([flowk, flow0[None]], 0)
                okk = jnp.concatenate([okk, ok0[None]], 0)
                s0 = jnp.where(okk & jnp.isfinite(resk[:, 0]),
                               resk[:, 0], jnp.inf)
                bi = jnp.argmin(s0)
                had = jnp.isfinite(s0[bi])
                return jnp.concatenate([
                    Rk[bi].reshape(-1), tk[bi], abk[bi], resk[bi], flowk[bi],
                    (okk[bi] & had).astype(jnp.float32)[None],
                    had.astype(jnp.float32)[None],
                ])

            self._track_fns[key] = jax.jit(retrack)
        return self._track_fns[key]

    def _run_retrack(self, Rs, ts, abs_, new_dIs, ref, packed_h0):
        exps = jnp.asarray([ref["exposure"], self._cur_exposure], jnp.float32)
        ref_aff = jnp.asarray(ref["aff"], jnp.float32)
        return self._get_retrack_fn()(
            jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(abs_),
            ref["pc"], new_dIs, exps, ref_aff,
            jnp.asarray(packed_h0))

    def _track_h0_inputs(self, frame):
        """Prologue of trackNewCoarse: motion hypotheses + affine init,
        under the shell lock.  Returns (tries, aff0, ref)."""
        ref = self.tracker_ref  # snapshot: the mapping thread may swap it
        self._cur_exposure = frame["exposure"]
        with self.shell_lock:
            tries = self._motion_hypotheses(ref)
            # init affine from the PREVIOUS frame (reference :528 slast->aff_g2l)
            if len(self.all_shells) >= 2:
                aff0 = np.asarray(self.all_shells[-2].aff_g2l, np.float32)
            else:
                aff0 = np.asarray(ref["aff_last"], np.float32)
        return tries, aff0, ref

    def _track_new_coarse(self, frame, packed0=None, pre=None,
                          retrack_sink=None):
        tries, aff0, ref = pre if pre is not None else self._track_h0_inputs(frame)

        # fast path: first hypothesis only (reference always breaks at :655
        # when it beats 1.5x the previous RMSE)
        if packed0 is None:
            R0, t0 = tries[0].Rt32()
            out = self._run_track(
                jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(aff0), frame["dIs"], False,
                ref=ref,
            )
            # the deferred trace slots in BEHIND the descent, so the pull
            # below never waits on the epipolar-search kernel
            self.flush_pending_trace()
            packed = np.asarray(out)
        else:
            self.flush_pending_trace()
            packed = np.asarray(packed0)
        R, t, ab, res, flow, ok = self._unpack_track(packed)
        best = (R.astype(np.float64), t.astype(np.float64),
                ab.astype(np.float64), res, flow)
        good = bool(ok) and np.isfinite(res[0])
        if (not (good and res[0] < self.last_coarse_rmse[0] * self.s.re_track_threshold)
                and len(tries) >= 3):
            n = len(tries)
            Rs = np.stack([x.Rt32()[0] for x in tries])
            ts = np.stack([x.Rt32()[1] for x in tries])
            abs_ = np.tile(aff0, (n, 1))
            if retrack_sink is not None:
                # multi-sequence executor: park the ladder inputs; the
                # executor batches every sequence's ladder into ONE
                # vmapped program and resumes via _retrack_adopt
                retrack_sink.append(dict(
                    sys=self, frame=frame, Rs=Rs, ts=ts, abs_=abs_,
                    ref=ref, packed=packed, tries=tries, aff0=aff0,
                    best=best))
                return RETRACK_PENDING
            # two-stage ladder as ONE device program: coarse triage of all
            # hypotheses, full descent on the top-3, winner by level-0
            # residual among those and the fast-path h0 descent
            packed_w = np.asarray(self._run_retrack(Rs, ts, abs_,
                                                    frame["dIs"], ref,
                                                    packed))
            return self._retrack_adopt(frame, tries, aff0, ref, best,
                                       packed_w)
        return self._track_finish(frame, tries, aff0, ref, best, good)

    def _retrack_adopt(self, frame, tries, aff0, ref, best, packed_w):
        """Resume after the re-track ladder program: adopt the winner."""
        had = packed_w[-1] > 0.5
        if had:
            Rw2, tw2, abw2, resw2, floww2, okw2 = self._unpack_track(
                packed_w[:-1])
            best = (Rw2.astype(np.float64), tw2.astype(np.float64),
                    abw2.astype(np.float64), resw2, floww2)
            good = bool(okw2) and np.isfinite(resw2[0])
        else:
            good = False
        return self._track_finish(frame, tries, aff0, ref, best, good)

    def _track_finish(self, frame, tries, aff0, ref, best, good):
        shell = frame["shell"]
        Rw, tw, abw, resw, floww = best
        if not good:
            # BIG ERROR fallback (:658-664): take predicted pose
            Rw, tw = tries[0].R, tries[0].t
            abw = aff0.astype(np.float64)
            floww = np.zeros(2)
            resw = np.full(self.calib.levels, np.nan)

        lastF_2_fh = SE3(Rw, tw)
        with self.shell_lock:
            shell.camToTrackingRef = lastF_2_fh.inverse()
            shell.trackingRef = ref["shell"]
            shell.aff_g2l = (float(abw[0]), float(abw[1]))
            shell.camToWorld = shell.trackingRef.camToWorld * shell.camToTrackingRef

        # lastCoarseRMSE = this frame's achieved residuals (reference :668);
        # NOT a running min -- that would tighten the fast-path gate forever.
        # After a BIG ERROR the reference leaves it NaN, which forces the
        # NEXT frame through the full ladder (NaN fails the fast-path gate,
        # FullSystem.cpp:655); do the same instead of clamping to a value.
        self.last_coarse_rmse = resw[: len(self.last_coarse_rmse)].copy()
        if self.s.log_stuff:
            # coarseTrackingLog stream (reference FullSystem.cpp:684-695)
            self.metrics.log(
                "coarse_tracking", id=shell.id, ts=shell.timestamp,
                exposure=frame["exposure"],
                xi=[round(float(x), 8) for x in shell.camToWorld.log()],
                a=float(abw[0]), b=float(abw[1]),
                res=float(resw[0]) if np.isfinite(resw[0]) else None)
        if self.first_coarse_rmse < 0:
            self.first_coarse_rmse = float(self.last_coarse_rmse[0])
        return np.array([resw[0] if np.isfinite(resw[0]) else np.nan,
                         floww[0], floww[1]])

    # ==================================================================
    # Immature tracing (traceNewCoarse :702)
    # ==================================================================
    def _trace_args(self, frame):
        nf = self.window.n_frames
        if nf == 0:
            return None
        F = self.window.F
        c = self.calib
        Km = c.K[0]
        Ki = c.Ki[0]
        KRKi = np.zeros((F, 3, 3), np.float32)
        Kt = np.zeros((F, 3), np.float32)
        affs = np.zeros((F, 2), np.float32)
        new_w2c = frame["shell"].camToWorld.inverse()
        for h in range(nf):
            host = self.window.frames[h]
            h2n = new_w2c * host.PRE_camToWorld
            KRKi[h] = Km @ h2n.R @ Ki
            Kt[h] = Km @ h2n.t
            affs[h] = self._aff_pair(host.ab_exposure, frame["exposure"],
                                     host.aff_g2l(), frame["shell"].aff_g2l)
        return frame["dIs"][0], KRKi, Kt, affs

    def _trace_kwargs(self):
        """Static trace knobs (settings.cpp:164-174) shared by every
        trace_update call site -- must be identical or XLA recompiles."""
        s = self.s
        c = self.calib
        return dict(
            n_steps=imm.n_steps_for(c.w[0], c.h[0], s.max_pix_search,
                                    s.trace_stepsize),
            stepsize=s.trace_stepsize,
            gn_iters=s.trace_gn_iterations,
            gn_threshold=s.trace_gn_threshold,
            slack_interval=s.trace_slack_interval,
            min_improvement=s.trace_min_improvement_factor,
            extra_slack=s.trace_extra_slack_on_th,
            # Search compaction is OPT-IN: the bucket's overflow deferral
            # (stale intervals under brightness drift -> initFailed resets)
            # and its faithful-early-return quality semantics both regressed
            # 350-frame parity ATE (0.21 -> 0.72 m with a reset / 0.21 ->
            # 0.32 m respectively; docs/ROADMAP.md round-3 post-mortem), so
            # accuracy keeps the dense search by default.
            search_bucket=(imm.search_bucket_for(
                self.window.F * s.max_immature_per_frame)
                if os.environ.get("NALO_TRACE_BUCKET", "0") == "1" else None),
        )

    def _next_trace_rot(self) -> int:
        """Rotating offset for the trace search-bucket overflow fairness
        (a dynamic scalar -- never recompiles)."""
        N = self.window.F * self.s.max_immature_per_frame
        self._trace_rot = (getattr(self, "_trace_rot", 0) + 7919) % max(N, 1)
        return self._trace_rot

    def _dispatch_trace(self, args):
        if args is None:
            return
        dI0, KRKi, Kt, affs = args
        c = self.calib
        F, M = self.window.F, self.s.max_immature_per_frame
        self.imm_trace = imm.trace_update(
            self.imm_static, self.imm_trace, dI0,
            jnp.asarray(KRKi), jnp.asarray(Kt), jnp.asarray(affs),
            self.s.max_pix_search,
            huber_th=self.s.huber_th, w_img=c.w[0], h_img=c.h[0],
            F=F, M=M, rot=jnp.int32(self._next_trace_rot()),
            **self._trace_kwargs(),
        )

    # imm_trace is guarded: reading it while a deferred trace dispatch is
    # outstanding would compute on stale intervals/statuses.  The ordering
    # invariant ("nothing reads imm_trace before flush") is enforced here
    # rather than by convention (round-2 verdict, Weak #7).
    @property
    def imm_trace(self):
        if getattr(self, "_pending_trace", None) is not None:
            raise AssertionError(
                "imm_trace read with a deferred trace dispatch outstanding; "
                "call flush_pending_trace() first")
        return self._imm_trace

    @imm_trace.setter
    def imm_trace(self, v):
        self._imm_trace = v

    def flush_pending_trace(self):
        """Dispatch a deferred trace update NOW (called right after the
        next frame's descent dispatch, and before anything reads
        imm_trace).  Deferral keeps the ~40 ms real-data epipolar-search
        kernel out of the device FIFO ahead of the latency-critical
        tracking descent -- it executes during host post-processing
        instead."""
        with self._trace_dispatch_lock:
            args = self._pending_trace
            self._pending_trace = None
            self._dispatch_trace(args)

    def _trace_new_coarse(self, frame, defer: bool = False):
        with self._trace_dispatch_lock:
            args0 = self._pending_trace
            self._pending_trace = None
            self._dispatch_trace(args0)
            args = self._trace_args(frame)
            if defer:
                self._pending_trace = args
            else:
                self._dispatch_trace(args)

    # ==================================================================
    # Keyframe pipeline (makeKeyFrame :1279)
    # ==================================================================
    def _make_keyframe(self, frame):
        """makeKeyFrame split at the window-GN boundary so a
        multi-sequence executor can batch several sequences' BA into one
        vmapped device call (parallel/multiseq.py)."""
        s = self.s
        if s.use_device_opt and s.overlap_activation:
            ctx = self._kf_pre_overlapped(frame)
            if ctx.get("gn") is not None:
                out, meta = ctx["gn"]
                with self._stage("optimize"):
                    rmse = self.window.gn_finish(out, meta)
                self._activate_overflow_repair(ctx)
                return self._kf_post(ctx, rmse)
            # no activation this KF: plain GN
            with self._stage("optimize"):
                rmse = self.window.optimize_device(s.max_opt_iterations)
            return self._kf_post(ctx, rmse)
        ctx = self._kf_pre(frame)
        with self._stage("optimize"):
            rmse = (self.window.optimize_device(s.max_opt_iterations)
                    if s.use_device_opt else self.window.optimize(s.max_opt_iterations))
        return self._kf_post(ctx, rmse)

    def _kf_pre_overlapped(self, frame):
        """makeKeyFrame front half, overlapped flavor: dispatch the
        activation program, PRE-ASSIGN the free point slots its accepted
        candidates will occupy, dispatch the window GN with the
        device-side activation merge (device_opt.make_gn_with_activation)
        -- and only THEN pull the activation flat (its D2H completes as
        soon as the activation program finishes, while the GN is still
        computing) and do the host mirror bookkeeping during the GN's
        device time.  Removes the ~30 ms activation pull round trip (and
        the host adopt) from the keyframe critical path."""
        s = self.s
        st = self._kf_stage1(frame)
        nt_pre = [_AsyncHost(lambda: self._new_traces_host(frame))]
        prep = self._activate_prepare_timed()
        ctx = self._kf_finish(st, nt_pre)
        ctx["gn"] = None
        if prep is None or self.window.n_frames < 2:
            return ctx
        t0 = time.perf_counter()
        flat_dev, new_valid = self._activate_dispatch(prep)
        t1 = time.perf_counter()
        budget = self._act_assign_budget()
        assigned = self.window.pts.free_slots(budget)
        imm = {k: self.imm_static[k]
               for k in ("u", "v", "color", "weights", "energy_th")}
        out, meta = self.window.gn_dispatch_overlapped(
            s.max_opt_iterations, flat_dev, imm, assigned, self._ACT_A)
        t2 = time.perf_counter()
        flat_np = np.asarray(flat_dev)   # ready when activation finishes
        t3 = time.perf_counter()
        overflow = self._activate_adopt_assigned(prep, flat_np, new_valid,
                                                 assigned, meta)
        t4 = time.perf_counter()
        self._stage_ms["act_dispatch"] = 1000.0 * (t1 - t0)
        self._stage_ms["act_wait"] = 1000.0 * (t3 - t2)
        self._stage_ms["act_adopt"] = 1000.0 * (t4 - t3)
        self._stage_ms["activate"] = 1000.0 * (t4 - t0) - 1000.0 * (t2 - t1)
        self.metrics.bump("act_candidates", int(flat_np[0]))
        self.metrics.bump("act_accepted", int(flat_np[1]))
        ctx["gn"] = (out, meta)
        ctx["act_overflow"] = overflow
        return ctx

    def _act_assign_budget(self) -> int:
        """Slot budget pre-assigned to the overlapped activation merge:
        2x the last acceptance (pow2, floor 256), capped at the
        activation program's A.  Overflow (rare) is repaired after the
        GN: those points are inserted late and miss one GN round."""
        last = getattr(self, "_last_n_acc", None)
        if last is None:
            return self._ACT_A
        b = 256
        while b < 2 * last + 64 and b < self._ACT_A:
            b *= 2
        return min(b, self._ACT_A)

    def _activate_adopt_assigned(self, prep, flat, new_valid, assigned,
                                 meta):
        """Host-mirror half of the overlapped activation adopt: replicate
        EXACTLY what the device merge did (rank-by-host slot assignment
        into `assigned`), without free_slots allocation or the static
        scatter queue-for-this-GN (the merge already wrote the program's
        copy; the canonical store update rides the normal pending-scatter
        at the NEXT GN prepare).  Returns the overflow candidates (rank
        >= len(assigned)) for post-GN repair insertion."""
        s = self.s
        w = self.window
        p = w.pts
        nf = prep["nf"]
        M = s.max_immature_per_frame
        Fd = F = w.F
        A = self._ACT_A
        self.imm_static = dict(self.imm_static, valid=new_valid)
        o = 2
        n_acc = min(int(flat[1]), A)
        self._last_n_acc = n_acc
        validf = flat[o:o + Fd * M] > 0.5
        o += Fd * M
        slot_a = flat[o:o + A].astype(np.int64); o += A
        packed_act = flat[o:o + A * (2 + F)].reshape(A, 2 + F)
        for h in range(nf):
            self.immatures[h].valid = validf[h * M:(h + 1) * M].copy()
        ok = (slot_a >= 0) & (packed_act[:, 1] > 0.5)
        if not ok.any():
            return None
        sidx = np.clip(slot_a, 0, F * M - 1)
        hosts = (sidx // M).astype(np.int32)
        # rank-by-host stable order == the device merge's assignment
        key = np.where(ok, hosts, F)
        order = np.argsort(key, kind="stable")
        rank_of = np.zeros(A, np.int64)
        rank_of[order] = np.arange(A)
        n_assign = len(assigned)
        take = ok & (rank_of < n_assign)
        kk = np.nonzero(take)[0]
        sl = np.asarray(assigned)[rank_of[kk]]
        hh = hosts[kk]
        jj = (sidx[kk] % M).astype(np.int64)
        imm_u = np.stack([st.u for st in self.immatures[:nf]])
        imm_v = np.stack([st.v for st in self.immatures[:nf]])
        imm_col = np.stack([st.color for st in self.immatures[:nf]])
        imm_wgt = np.stack([st.weights for st in self.immatures[:nf]])
        imm_eth = np.stack([st.energy_th for st in self.immatures[:nf]])
        imm_mty = np.stack([st.my_type for st in self.immatures[:nf]])
        hc = np.clip(hh, 0, nf - 1)
        # insert_points body at predetermined slots
        p.active[sl] = True
        p.host[sl] = hh
        p.u[sl] = imm_u[hc, jj]
        p.v[sl] = imm_v[hc, jj]
        p.color[sl] = imm_col[hc, jj]
        p.weights[sl] = imm_wgt[hc, jj]
        p.idepth[sl] = packed_act[kk, 0].astype(np.float32)
        p.idepth_zero[sl] = packed_act[kk, 0].astype(np.float32)
        p.energy_th[sl] = imm_eth[hc, jj]
        p.prior[sl] = 0.0
        p.has_depth_prior[sl] = False
        p.num_good_res[sl] = 0
        p.max_rel_baseline[sl] = 0
        p.status[sl] = 0
        p.last_res_state[sl] = RES_OOB
        p.my_type[sl] = imm_mty[hc, jj]
        res_in = packed_act[kk, 2:] > 0.5
        p.r_exists[sl] = res_in
        p.r_state[sl] = np.where(res_in, RES_IN, RES_NONE).astype(np.int8)
        p.r_active[sl] = False
        p.r_linearized[sl] = False
        p.r_is_new[sl] = res_in
        newest_i = nf - 1
        p.last_res_state[sl, 0] = np.where(res_in[:, newest_i], RES_IN,
                                           RES_OOB)
        if nf >= 2:
            p.last_res_state[sl, 1] = np.where(res_in[:, nf - 2], RES_IN,
                                               RES_OOB)
        # canonical device static store: ride the normal pending scatter
        # (flushed by the NEXT GN prepare; THIS GN got them via the merge)
        if getattr(w, "_pts_static_dev", None) is not None:
            w._pts_static_pending.append(np.asarray(sl))
        # fix-time bookkeeping needs the new rows in active_pre
        meta["active_pre"][sl] = res_in
        self.statistics["n_points_activated"] += len(sl)
        # overflow: accepted but beyond the assigned budget
        kk_over = np.nonzero(ok & (rank_of >= n_assign))[0]
        if len(kk_over) == 0:
            return None
        self.metrics.bump("act_assign_overflow", len(kk_over))
        hco = np.clip(hosts[kk_over], 0, nf - 1)
        jjo = (sidx[kk_over] % M).astype(np.int64)
        return dict(
            hosts=hosts[kk_over], idepth=packed_act[kk_over, 0],
            res_in=packed_act[kk_over, 2:] > 0.5,
            u=imm_u[hco, jjo], v=imm_v[hco, jjo], color=imm_col[hco, jjo],
            weights=imm_wgt[hco, jjo], eth=imm_eth[hco, jjo],
            mty=imm_mty[hco, jjo], nf=nf)

    def _activate_overflow_repair(self, ctx):
        """Insert activation candidates that exceeded the pre-assigned
        budget (rare): they join the window AFTER this KF's GN, i.e. one
        optimization round late, instead of being dropped."""
        ov = ctx.get("act_overflow")
        if ov is None:
            return
        w = self.window
        p = w.pts
        nf = ov["nf"]
        for hh in range(nf):
            m = ov["hosts"] == hh
            if not m.any():
                continue
            slots = w.insert_points(
                hh, ov["u"][m], ov["v"][m], ov["color"][m],
                ov["weights"][m], ov["idepth"][m], ov["eth"][m],
                my_type=ov["mty"][m])
            tgt_lists = ov["res_in"][m][: len(slots)]
            for tt in range(nf):
                if tt == hh:
                    continue
                tsel = slots[tgt_lists[:, tt]]
                if len(tsel) == 0:
                    continue
                w.add_residuals(tsel, tt)
                if tt == nf - 1:
                    p.last_res_state[tsel, 0] = RES_IN
                elif tt == nf - 2:
                    p.last_res_state[tsel, 1] = RES_IN
            self.statistics["n_points_activated"] += len(slots)

    def _kf_pre(self, frame):
        st = self._kf_stage1(frame)
        # pixel selection for the new KF's traces is independent of the
        # window: run it in a worker thread that overlaps the activation
        # round trip AND the window-GN device wait (~120 ms of numpy at
        # KITTI-class resolution, fully hidden behind ~250 ms of pulls)
        nt_pre = [_AsyncHost(lambda: self._new_traces_host(frame))]
        prep = self._activate_prepare_timed()
        if prep is None:
            return self._kf_finish(st, nt_pre)
        t0 = time.perf_counter()
        flat_dev, new_valid = self._activate_dispatch(prep)
        t1 = time.perf_counter()
        flat_np = np.asarray(flat_dev)
        t3 = time.perf_counter()
        self._activate_adopt(prep, flat_np, new_valid)
        t4 = time.perf_counter()
        # sub-stage split (all inside "activate"): dispatch / pull wait /
        # host adopt (the selector runs concurrently in its thread)
        self._stage_ms["act_dispatch"] = 1000.0 * (t1 - t0)
        self._stage_ms["act_wait"] = 1000.0 * (t3 - t1)
        self._stage_ms["act_adopt"] = 1000.0 * (t4 - t3)
        # candidate/acceptance counts (sizes the fused act->GN path and
        # feeds the drift forensics: a drop in activation under
        # brightness drift starves the window)
        self.metrics.bump("act_candidates", int(flat_np[0]))
        self.metrics.bump("act_accepted", int(flat_np[1]))
        self._stage_ms["activate"] = (
            self._stage_ms.get("activate", 0.0)
            + 1000.0 * (time.perf_counter() - t0))
        return self._kf_finish(st, nt_pre)

    def _kf_stage1(self, frame, pre_traced: bool = False):
        """makeKeyFrame up to (excluding) point activation.  pre_traced:
        the multi-sequence executor already ran this frame's trace as part
        of a batched dispatch."""
        s = self.s
        shell = frame["shell"]
        self._stage_ms = {}
        self.window.stage_ms = self._stage_ms  # GN sub-stage timers land here
        t_kf0 = time.perf_counter()
        with self.shell_lock:
            if shell.trackingRef is not None:
                shell.camToWorld = shell.trackingRef.camToWorld * shell.camToTrackingRef

        if not pre_traced:
            with self._stage("trace"):
                self._trace_new_coarse(frame)
        self._flag_frames_for_marginalization()

        fs = FrameState(len(self.all_kf_shells), shell, frame["exposure"], s)
        fs.set_eval_pt_scaled(shell.camToWorld.inverse(), *shell.aff_g2l)
        fs.haveground = False
        fs.groundP = np.zeros(4)
        self.all_kf_shells.append(shell)
        with self._stage("insert"):
            new_idx = self.window.insert_frame(fs, frame["dIs"][0])
        self.immatures.append(ImmatureStore(s.max_immature_per_frame))
        self.frame_pyramids[id(fs)] = (frame["dIs"], frame["absgrads"])
        self.kf_masks.append(frame.get("mask"))
        self.kf_images.append(frame.get("image"))
        self.kf_bgr.append(frame.get("bgr"))
        self.statistics["n_keyframes"] += 1

        # residuals from all existing points to the new frame (:1334-1348);
        # lastResiduals shift: [1] <- [0], [0] <- (new residual, IN)
        p = self.window.pts
        existing = np.nonzero(p.active)[0]
        if len(existing):
            p.last_res_state[existing, 1] = p.last_res_state[existing, 0]
            p.last_res_state[existing, 0] = RES_IN
            self.window.add_residuals(existing, new_idx)
        return dict(frame=frame, fs=fs, new_idx=new_idx, t_kf0=t_kf0)

    def _activate_prepare_timed(self):
        t0 = time.perf_counter()
        prep = self._activate_prepare()
        self._stage_ms["activate"] = (
            self._stage_ms.get("activate", 0.0)
            + 1000.0 * (time.perf_counter() - t0))
        return prep

    def _kf_finish(self, st, nt_pre):
        fs = st["fs"]
        fs.frame_energy_th = self.window.frames[-2].frame_energy_th if self.window.n_frames > 1 else fs.frame_energy_th
        return dict(frame=st["frame"], fs=fs, new_idx=st["new_idx"],
                    nt_pre=nt_pre, t_kf0=st["t_kf0"])

    def _kf_post(self, ctx, rmse):
        s = self.s
        frame = ctx["frame"]
        fs = ctx["fs"]
        new_idx = ctx["new_idx"]
        nt_pre = ctx["nt_pre"]
        t_kf0 = ctx["t_kf0"]
        p = self.window.pts

        if s.log_stuff:
            # calibLog stream (reference FullSystemOptimize.cpp:576-583)
            self.metrics.log(
                "calib", kf=fs.frame_id,
                calib=[round(float(x), 6) for x in self.window.calib_value],
                newest_state=[round(float(x), 8) for x in
                              self.window.frames[-1].state[:8]],
                rmse=round(float(rmse), 5))
        # init-failure checks (:1370-1387)
        nkf = len(self.all_kf_shells)
        slack = s.benchmark_initializer_slack_factor
        if nkf <= 4 and (
            (nkf == 2 and rmse > 20 * slack)
            or (nkf == 3 and rmse > 13 * slack)
            or (nkf == 4 and rmse > 9 * slack)
        ):
            self.init_failed = True
        if not np.isfinite(rmse):
            self.is_lost = True
            return rmse

        # eigenvalue/diagonal/nullspace spectra stream (printEigenValLine,
        # reference FullSystem.cpp:1755-1835), gated like setting_logStuff;
        # costs one extra device call + pull per KF so it is off by default
        if s.log_stuff:
            from ..backend import device_opt as Dv
            p_ = self.window.pts
            mask_all = p_.r_exists & p_.r_active
            flat_h = np.asarray(Dv.make_marg_points(s, self.window.F, self.window.P)(
                self.window.jstore, jnp.asarray(mask_all),
                jnp.asarray(p_.host), jnp.asarray(p_.prior, jnp.float32),
                jnp.asarray(self.window.ad_host, jnp.float32),
                jnp.asarray(self.window.ad_target, jnp.float32),
            ), np.float64)
            nfull = 4 + 8 * self.window.F
            Hs = flat_h[: nfull * nfull].reshape(nfull, nfull)
            na = 4 + 8 * self.window.n_frames
            Hs = 0.5 * (Hs[:na, :na] + Hs[:na, :na].T)
            ev = np.linalg.eigvalsh(Hs)
            self.metrics.log(
                "eigen", kf=fs.frame_id,
                eigenvalues=[round(float(x), 6) for x in ev],
                diag=[round(float(x), 6) for x in np.diag(Hs)],
                nullspaces=len(self.window.last_nullspaces),
            )

        self._remove_outliers()
        with self._stage("tracker_ref"):
            self._set_tracker_ref(frame)

        # --- PLANE/SCALE pipeline (reference FullSystem.cpp:1420-1443) ---
        fs_n = self.window.frames[-1]
        if (getattr(fs_n, "haveground", False) and s.plane_optimize
                and fs_n.groundP[3] != 0):
            with self._stage("plane"):
                if not self.global_plane.fixed:
                    gps = [getattr(f, "groundP", np.zeros(4)) for f in self.window.frames]
                    if self.global_plane.set_global_plane(
                            self.window.frames, gps, s.max_frames):
                        self.metrics.log("plane_lock", kf=fs_n.frame_id,
                                         lgh=round(self.global_plane.lgh, 5))
                if self.ground_state.scale_fix and self.global_plane.fixed:
                    sc = plane_optimize(self.window, self.global_plane.lgh,
                                        fs_n.groundP)
                    rm = sw_gray_optimize(self.window,
                                          iters=s.plane_reopt_iters)
                    self.metrics.log(
                        "plane_opt", kf=fs_n.frame_id,
                        scale=round(float(sc), 6),
                        lgh=round(self.global_plane.lgh, 5),
                        gp3=round(float(fs_n.groundP[3]), 5),
                        rmse=round(float(rm), 4))

        with self._stage("marg_points"):
            with self._stage("marg_flag"):
                self._flag_points_for_removal()
            self.window.nullspaces()
            # archive marginalized points per host KF so they can be published
            # with the final pose when the frame leaves the window (the
            # reference's pointHessiansMarginalized -> SampleOutputWrapper path)
            marg_sel = (p.status == 1) & p.active
            if marg_sel.any():
                for hh in np.unique(p.host[marg_sel]):
                    mm = marg_sel & (p.host == hh)
                    fid = self.window.frames[int(hh)].frame_id
                    arch = self._marg_points.setdefault(fid, [])
                    arch.append(np.stack([p.u[mm], p.v[mm], p.idepth[mm]], 1))
            with self._stage("marg_dispatch"):
                self.window.marginalize_points(p.status == 1)
            p.status[:] = 0
        with self._stage("new_traces"):
            self._make_new_traces(frame, new_idx, host_pre=_nt_result(nt_pre[0]))

        # --- dense surfel mapping on the 3rd-newest KF (:1488-1496) ---
        if (self.global_plane.fixed and s.dense_mapping
                and self.window.n_frames >= 3):
            didx = self.window.n_frames - 3
            if self.kf_masks[didx] is not None:
                self.sync_immature_host()
                pm = self.window.pts
                msk = pm.active & (pm.host == didx)
                st = self.immatures[didx]
                iu = np.concatenate([pm.u[msk], st.u[st.valid]])
                iv = np.concatenate([pm.v[msk], st.v[st.valid]])
                iid = np.concatenate([
                    pm.idepth[msk],
                    0.5 * (st.idepth_min[st.valid] + st.idepth_max[st.valid]),
                ])
                # assembled multi-KF sparse world cloud for the cross-KF
                # acceptPatch gate (reference refineMap/keyFrameMap :19-114)
                K0 = np.linalg.inv(self.calib.Ki[0])
                clouds = []
                for fi, fh in enumerate(self.window.frames):
                    sel = pm.active & (pm.host == fi)
                    if sel.any():
                        clouds.append(dmap.key_frame_map(
                            pm.u[sel], pm.v[sel], pm.idepth[sel],
                            fh.PRE_camToWorld, K0))
                sparse_world = (np.concatenate(clouds)
                                if clouds else np.zeros((0, 3)))
                cloud = dmap.update_map(
                    self.kf_masks[didx], iu, iv, iid,
                    self.kf_images[didx], self.calib.Ki[0],
                    self.calib.w[0], self.calib.h[0],
                    bgr=self.kf_bgr[didx],
                    seed=s.seed + self.window.frames[didx].frame_id,
                    cam_to_world=self.window.frames[didx].PRE_camToWorld,
                    sparse_world=sparse_world,
                )
                if cloud is not None:
                    self.dense_maps[self.window.frames[didx].frame_id] = cloud

        # publish graph + current window (reference :1498-1502)
        if self.output_wrappers:
            conn = self.window.connectivity()
            for ow in self.output_wrappers:
                try:
                    ow.publish_graph(conn)
                    ow.publish_keyframes(self.window.frames, False,
                                         self.window, self.calib)
                except Exception:
                    pass

        # marginalize flagged frames (:1506-1508)
        with self._stage("marg_frames"):
            i = 0
            while i < self.window.n_frames:
                if self.window.frames[i].flagged_for_marg:
                    self._marginalize_frame(i)
                    i = 0
                else:
                    i += 1

        # per-KF structured record (printLogLine equivalent)
        self._stage_ms["total"] = 1000.0 * (time.perf_counter() - t_kf0)
        win = self.window.frames
        self.metrics.keyframe(
            fs.frame_id, rmse, self.window.pts.n_active(), len(win),
            (win[0].frame_id, win[-1].frame_id) if win else (0, 0),
            stages={k: round(v, 1) for k, v in self._stage_ms.items()},
        )
        return rmse

    def _make_non_keyframe(self, frame):
        shell = frame["shell"]
        with self.shell_lock:
            if shell.trackingRef is not None:
                shell.camToWorld = shell.trackingRef.camToWorld * shell.camToTrackingRef
        self._trace_new_coarse(frame, defer=True)

    # ------------------------------------------------------------------
    def _flag_frames_for_marginalization(self):
        """Reference FullSystemMarginalize.cpp:58-147."""
        frames = self.window.frames
        p = self.window.pts
        in_pts = [
            int((p.active & (p.host == i)).sum()) + int(self.immatures[i].valid.sum())
            for i in range(len(frames))
        ]
        out_pts = [getattr(fh, "n_pts_marginalized", 0) + getattr(fh, "n_pts_out", 0)
                   for fh in frames]
        latest = frames[-1]
        log_rel_a = [
            abs(np.log(self._aff_pair(latest.ab_exposure, fh.ab_exposure,
                                      latest.aff_g2l(), fh.aff_g2l())[0]))
            for fh in frames
        ]
        dists = np.zeros((len(frames), len(frames)))
        for i, fh in enumerate(frames):
            for j, other in enumerate(frames):
                if i != j:
                    dists[i, j] = np.linalg.norm(
                        (other.PRE_worldToCam * fh.PRE_camToWorld).t
                    )
        flags = compute_marg_flags(
            in_pts, out_pts, log_rel_a, [fh.frame_id for fh in frames], dists, self.s
        )
        for fh, fl in zip(frames, flags):
            if fl:
                fh.flagged_for_marg = True

    # ------------------------------------------------------------------
    def _activate_points(self, overlap_fn=None):
        """activatePointsMT (:764-934).  overlap_fn, when given, runs
        between the activation dispatch and its pull (host work hidden
        behind the device round trip).  Split into prepare / dispatch /
        adopt so the multi-sequence executor can vmap the device program
        across sequences (parallel/multiseq.py)."""
        prep = self._activate_prepare()
        if prep is None:
            return
        flat_dev, new_valid = self._activate_dispatch(prep)
        if overlap_fn is not None:
            overlap_fn()
        self._activate_adopt(prep, np.asarray(flat_dev), new_valid)

    def _activate_prepare(self):
        """Density feedback + host-side inputs of the one-call activation
        program; None when the window is too small."""
        s = self.s
        w = self.window
        p = w.pts
        n_pts = p.n_active()
        want = s.desired_point_density
        # density feedback (:767-788)
        if n_pts < want * 0.66:
            self.current_min_act_dist -= 0.8
        if n_pts < want * 0.8:
            self.current_min_act_dist -= 0.5
        elif n_pts < want * 0.9:
            self.current_min_act_dist -= 0.2
        elif n_pts < want:
            self.current_min_act_dist -= 0.1
        if n_pts > want * 1.5:
            self.current_min_act_dist += 0.8
        if n_pts > want * 1.3:
            self.current_min_act_dist += 0.5
        if n_pts > want * 1.15:
            self.current_min_act_dist += 0.2
        if n_pts > want:
            self.current_min_act_dist += 0.1
        self.current_min_act_dist = float(np.clip(self.current_min_act_dist, 0, 4))

        nf = w.n_frames
        if nf < 2:
            return
        newest = nf - 1

        # The ENTIRE activation runs as ONE device call + ONE flat pull
        # (imm.activation_run): candidate gating, dead/OOB deletion,
        # distance map, the greedy spacing loop, the accepted slots'
        # static-data gather, the batched idepth LM, and the valid-bit
        # consumption.  The host only inserts the accepted points.
        M = self.s.max_immature_per_frame
        Fd = w.F
        KRKi1 = np.zeros((Fd, 3, 3), np.float32)
        Kt1f = np.zeros((Fd, 3), np.float32)
        new_fs0 = w.frames[newest]
        for hh in range(nf):
            h2n = new_fs0.PRE_worldToCam * w.frames[hh].PRE_camToWorld
            KRKi1[hh] = self.calib.K[1] @ h2n.R @ self.calib.Ki[0]
            Kt1f[hh] = self.calib.K[1] @ h2n.t
        m_in = p.active & (p.host != newest)
        flagged = np.zeros(Fd, bool)
        for hh in range(nf):
            flagged[hh] = w.frames[hh].flagged_for_marg
        F = w.F
        PRE_R = np.zeros((F, F, 3, 3), np.float32)
        PRE_t = np.zeros((F, F, 3), np.float32)
        PRE_aff = np.zeros((F, F, 2), np.float32)
        for hh in range(nf):
            host = w.frames[hh]
            for tt in range(nf):
                target = w.frames[tt]
                h2t = target.PRE_worldToCam * host.PRE_camToWorld
                PRE_R[hh, tt] = h2t.R
                PRE_t[hh, tt] = h2t.t
                PRE_aff[hh, tt] = self._aff_pair(host.ab_exposure, target.ab_exposure,
                                                 host.aff_g2l(), target.aff_g2l())
        f_act = np.zeros(F, bool)
        f_act[:nf] = True
        return dict(
            u=p.u, v=p.v, idepth=p.idepth, host=p.host, m_in=m_in,
            KRKi1=KRKi1, Kt1f=Kt1f, flagged=flagged, newest=newest,
            min_act_dist=np.float32(self.current_min_act_dist),
            PRE_R=PRE_R, PRE_t=PRE_t, PRE_aff=PRE_aff, f_act=f_act,
            calib=np.asarray(w.calib_value, np.float32), nf=nf,
        )

    # activation program pad sizes (candidates / accepted slots)
    _ACT_C, _ACT_A = 4096, 2048

    def _activate_dispatch(self, prep):
        s = self.s
        w = self.window
        flat_dev, new_valid = imm.activation_run(
            self.imm_static, self.imm_trace, w.images,
            jnp.asarray(prep["u"]), jnp.asarray(prep["v"]),
            jnp.asarray(prep["idepth"]), jnp.asarray(prep["host"]),
            jnp.asarray(prep["m_in"]),
            jnp.asarray(prep["KRKi1"]), jnp.asarray(prep["Kt1f"]),
            jnp.asarray(prep["flagged"]), jnp.int32(prep["newest"]),
            s.min_trace_quality, jnp.float32(prep["min_act_dist"]),
            jnp.asarray(prep["PRE_R"]), jnp.asarray(prep["PRE_t"]),
            jnp.asarray(prep["PRE_aff"]),
            jnp.asarray(prep["f_act"]), jnp.asarray(prep["calib"]),
            s.min_idepth_h_act,
            F=w.F, M=s.max_immature_per_frame,
            C=self._ACT_C, A=self._ACT_A,
            h1=self.calib.h[1], w1=self.calib.w[1], dm_iters=40,
            iters=s.gn_its_on_point_activation, huber_th=s.huber_th,
            w_img=self.calib.w[0], h_img=self.calib.h[0],
            images_quad=w.quads,
        )
        return flat_dev, new_valid

    def _activate_adopt(self, prep, flat, new_valid):
        """Adopt the (pulled) activation result: device-side deletions,
        accepted-point insertion + residual wiring."""
        s = self.s
        w = self.window
        p = w.pts
        nf = prep["nf"]
        newest = prep["newest"]
        M = s.max_immature_per_frame
        Fd = F = w.F
        A = self._ACT_A
        # the device store's valid bits are already consumed; adopt the
        # returned array without a write-back dispatch
        self.imm_static = dict(self.imm_static, valid=new_valid)
        o = 2
        n_acc = min(int(flat[1]), A)
        validf = flat[o:o + Fd * M] > 0.5
        o += Fd * M
        slot_a = flat[o:o + A].astype(np.int64); o += A
        packed_act = flat[o:o + A * (2 + F)].reshape(A, 2 + F)
        # adopt the device-side deletions + consumption wholesale
        for h in range(nf):
            self.immatures[h].valid = validf[h * M:(h + 1) * M].copy()
        if n_acc == 0:
            return

        sel = slice(0, n_acc)
        hosts = (slot_a[sel] // M).astype(np.int32)
        jj = (slot_a[sel] % M).astype(np.int64)
        idepth = packed_act[sel, 0].astype(np.float32)
        ok = packed_act[sel, 1] > 0.5
        res_in = packed_act[sel, 2:] > 0.5
        # static data of the accepted slots from the host mirrors (byte
        # identical to the device store the LM read from)
        imm_u = np.stack([st.u for st in self.immatures])
        imm_v = np.stack([st.v for st in self.immatures])
        imm_col = np.stack([st.color for st in self.immatures])
        imm_wgt = np.stack([st.weights for st in self.immatures])
        imm_eth = np.stack([st.energy_th for st in self.immatures])
        imm_mty = np.stack([st.my_type for st in self.immatures])
        hc = np.clip(hosts, 0, nf - 1)
        u_a = imm_u[hc, jj]
        v_a = imm_v[hc, jj]
        col_a = imm_col[hc, jj]
        wgt_a = imm_wgt[hc, jj]
        eth_a = imm_eth[hc, jj]
        mty_a = imm_mty[hc, jj]

        # insert activated points (batched per host, residuals per target)
        for hh in range(nf):
            m = ok & (hosts == hh)
            if not m.any():
                continue
            slots = w.insert_points(
                hh, u_a[m], v_a[m], col_a[m], wgt_a[m],
                idepth[m], eth_a[m], my_type=mty_a[m],
            )
            tgt_lists = res_in[m][: len(slots)]
            for tt in range(nf):
                if tt == hh:
                    continue
                tsel = slots[tgt_lists[:, tt]]
                if len(tsel) == 0:
                    continue
                w.add_residuals(tsel, tt)
                # lastResiduals init for fresh points (reference
                # FullSystemOptPoint.cpp:188-199): IN towards the newest
                # two frames when those residuals exist
                if tt == nf - 1:
                    p.last_res_state[tsel, 0] = RES_IN
                elif tt == nf - 2:
                    p.last_res_state[tsel, 1] = RES_IN
            self.statistics["n_points_activated"] += len(slots)

    # ------------------------------------------------------------------
    def _remove_outliers(self):
        p = self.window.pts
        no_res = p.active & ~p.r_exists.any(axis=1)
        if no_res.any():
            self._count_removed(no_res, out=True)
            p.remove(np.nonzero(no_res)[0])

    def _count_removed(self, sel, out: bool):
        """Book removed points into their host's lifetime counters
        (reference pointHessiansOut / pointHessiansMarginalized)."""
        hosts = self.window.pts.host[sel]
        for hh, cnt in zip(*np.unique(hosts, return_counts=True)):
            fh = self.window.frames[int(hh)]
            attr = "n_pts_out" if out else "n_pts_marginalized"
            setattr(fh, attr, getattr(fh, attr, 0) + int(cnt))

    def _flag_points_for_removal(self):
        """flagPointsForRemoval (:937-1030): status 1=marginalize, 2=drop.

        Faithful isOOB (reference HessianBlocks.h:484-507):
          rule 1: the point has enough residuals and is well-observed, but
                  removing the IN residuals that see marg-flagged frames
                  would leave too few;
          rule 2: the last residual towards the newest frame went OOB;
          rule 3: the residuals towards the newest two frames both went
                  OUTLIER (and the point still has >= 2 residuals).
        Plus host-flagged frames (FullSystem.cpp:973 `|| host->flagged...`).
        """
        s = self.s
        w = self.window
        p = w.pts
        flagged_hosts = np.array(
            [f.flagged_for_marg for f in w.frames] + [False] * (w.F - w.n_frames)
        )
        act = p.active
        # residuals.size(): existing residual slots (dropped ones are gone)
        n_res = p.r_exists.sum(axis=1)
        drop = act & ((p.idepth < 0) | (n_res == 0))

        vis_in_marg = (
            p.r_exists & (p.r_state == RES_IN) & flagged_hosts[None, : w.F]
        ).sum(axis=1)
        rule1 = (
            (n_res >= s.min_good_active_res_for_marg)
            & (p.num_good_res > s.min_good_res_for_marg + 10)
            & (n_res - vis_in_marg < s.min_good_active_res_for_marg)
        )
        rule2 = p.last_res_state[:, 0] == RES_OOB
        rule3 = (
            (n_res >= 2)
            & (p.last_res_state[:, 0] == RES_OUTLIER)
            & (p.last_res_state[:, 1] == RES_OUTLIER)
        )
        oob_like = act & ~drop & (
            rule1 | rule2 | rule3 | flagged_hosts[p.host]
        )

        is_inlier = (n_res >= s.min_good_active_res_for_marg) & (
            p.num_good_res >= s.min_good_res_for_marg
        )
        marg = oob_like & is_inlier & (p.idepth_hessian > s.min_idepth_h_marg)
        drop2 = oob_like & (~is_inlier | (p.idepth_hessian <= s.min_idepth_h_marg))
        p.status[marg] = 1
        p.status[drop | drop2] = 2
        if marg.any():
            self._count_removed(marg, out=False)
        if (drop | drop2).any():
            self._count_removed(drop | drop2, out=True)
        if s.log_stuff and (marg.any() or drop.any() or drop2.any()):
            # lifetimesLog equivalent (reference printLogLine lifetimes,
            # FullSystem.cpp:1837-1868): aggregate per-KF removal stats
            gone = marg | drop | drop2
            self.metrics.log(
                "lifetimes", n_marg=int(marg.sum()),
                n_drop=int((drop | drop2).sum()),
                mean_good_res=round(float(p.num_good_res[gone].mean()), 2),
                mean_idepth=round(float(p.idepth[gone].mean()), 5))
        if (drop | drop2).any():
            p.remove(np.nonzero(drop | drop2)[0])

    # ------------------------------------------------------------------
    def _set_tracker_ref(self, frame):
        """setCoarseTrackingRef + makeCoarseDepthL0 (:1402-1404, :382-538)."""
        w = self.window
        p = w.pts
        newest = w.n_frames - 1
        # points with IN residual to the newest frame; projection from the
        # final linearization (centerProjectedTo)
        m = p.active & p.r_exists[:, newest] & (p.r_state[:, newest] == RES_IN)
        cp_dev = w._center_newest_dev  # (P, 3), device-resident
        hdif = np.divide(1.0, p.idepth_hessian, out=np.zeros_like(p.idepth_hessian), where=p.idepth_hessian > 0)
        weight = np.sqrt(1e-3 / (hdif + 1e-12)).astype(np.float32)

        # --- NALO dense frontend (reference CoarseTracker.cpp:540-824) ---
        fs_new = w.frames[newest]
        D = self._dense_max
        du = np.zeros(D, np.float32)
        dv = np.zeros(D, np.float32)
        did = np.zeros(D, np.float32)
        dw = np.zeros(D, np.float32)
        dvalid = np.zeros(D, bool)
        mask_img = self.kf_masks[newest] if newest < len(self.kf_masks) else None
        if self.s.dense_track and mask_img is not None:
            cp = np.asarray(cp_dev)  # pull only when the mask path runs
            res_df = dense_frontend_update(
                mask_img, cp[m, 0], cp[m, 1], cp[m, 2],
                self.kf_images[newest], self.calib.Ki[0],
                self.calib.w[0], self.calib.h[0], self.ground_state,
                seed=self.s.seed + frame["shell"].id,
            )
            if res_df is not None:
                fs_new.haveground = res_df["have_ground"]
                fs_new.groundP = np.asarray(res_df["groundP"])
                # drift forensics: the per-KF ground estimate + the
                # scale-fix state machine's verdict (accepted planes drive
                # the plane_optimize rescale; a biased height here rescales
                # the whole trajectory)
                gs = self.ground_state
                self.metrics.log(
                    "ground", kf=fs_new.frame_id,
                    height=round(float(res_df["ground_height"]), 5),
                    have_ground=bool(res_df["have_ground"]),
                    scale_fix=bool(gs.scale_fix),
                    init_height=round(float(gs.init_height), 5),
                    rate=round(float(res_df["ground_height"] / gs.init_height), 5)
                    if gs.scale_fix and gs.init_height > 0 else None,
                )
                if res_df["dense"] is not None:
                    ddu, ddv, ddid, _ddc = res_df["dense"]
                    n = min(len(ddu), D)
                    du[:n], dv[:n], did[:n] = ddu[:n], ddv[:n], ddid[:n]
                    dw[:n] = 1.0
                    dvalid[:n] = True

        maps = make_coarse_depth_maps(
            jnp.concatenate([cp_dev[:, 0], jnp.asarray(du)]),
            jnp.concatenate([cp_dev[:, 1], jnp.asarray(dv)]),
            jnp.concatenate([cp_dev[:, 2], jnp.asarray(did)]),
            jnp.asarray(np.concatenate([weight, dw])),
            jnp.concatenate([jnp.asarray(m), jnp.asarray(dvalid)]),
            self.frame_pyramids[id(w.frames[newest])][0], self.shapes,
        )
        dIs = self.frame_pyramids[id(w.frames[newest])][0]
        # compact pc buffers (reference pc_u/v/idepth/color): the tracker
        # iterates these instead of the 2-4%%-valid dense maps
        pc = compact_pc(tuple(maps), dIs, self._pc_caps)
        fs = w.frames[newest]
        self.tracker_ref = dict(
            shell=fs.shell, pc=pc,
            aff=fs.aff_g2l(), aff_last=fs.aff_g2l(), exposure=fs.ab_exposure,
        )
        # depth-image pane (reference pushDepthImage, drawn from the
        # tracker's reference idepth map); pulled only when a sink wants it
        sinks = [ow for ow in self.output_wrappers
                 if getattr(ow, "wants_depth_image", False)]
        if sinks:
            idm = np.asarray(maps[0][0])
            vm = np.asarray(maps[0][1])
            bg = self.kf_images[newest] if newest < len(self.kf_images) else None
            for ow in sinks:
                try:
                    ow.push_depth_image(dict(idepth=idm, valid=vm & (idm > 0),
                                             background=bg))
                except Exception:
                    pass

    # ------------------------------------------------------------------
    def sync_immature_host(self):
        """Pull the device-resident trace state into the host stores.
        The hot path never needs this (activation gates on device); the
        dense mapper and checkpointing do."""
        M = self.s.max_immature_per_frame
        self.flush_pending_trace()
        packed = np.asarray(imm.pack_for_host(self.imm_static, self.imm_trace))
        for h, st in enumerate(self.immatures):
            sl = packed[h * M:(h + 1) * M]
            st.idepth_min = sl[:, 2].copy()
            st.idepth_max = sl[:, 3].copy()
            st.status = sl[:, 4].astype(np.int32)
            st.quality = sl[:, 5].copy()
            st.pixel_interval = sl[:, 6].copy()

    def _push_imm_valid(self):
        F, M = self.window.F, self.s.max_immature_per_frame
        valid = np.zeros(F * M, bool)
        for h, st in enumerate(self.immatures):
            valid[h * M : (h + 1) * M] = st.valid
        self.imm_static = imm.set_valid(self.imm_static, jnp.asarray(valid))

    def _new_traces_host(self, frame):
        """Host half of makeNewTraces (:1656-1690): pixel selection +
        static immature data.  Independent of the window state, so the
        keyframe path runs it WHILE the activation program's device round
        trip is in flight."""
        s = self.s
        # host mini-pyramid for the (host-side) selector: avoids pulling the
        # device pyramid over the link
        h_dI0, h_ags = _host_selector_pyramid(frame["image"], self.gamma_b_grad_np)
        status = self.selector.make_maps(
            h_dI0, h_ags, s.desired_immature_density, frame_id=frame["shell"].id,
        )
        if s.use_lidar and frame.get("mask") is not None:
            status = self.selector.fuse_with_mask(status, frame["mask"])
        h0, w0 = self.calib.h[0], self.calib.w[0]
        ys, xs = np.nonzero(status)
        keep = (xs >= 3) & (xs < w0 - 4) & (ys >= 3) & (ys < h0 - 4)
        ys, xs = ys[keep], xs[keep]
        types = status[ys, xs]
        M = s.max_immature_per_frame
        if len(xs) > M:
            sel = self.selector.rng.choice(len(xs), M, replace=False)
            xs, ys, types = xs[sel], ys[sel], types[sel]
        return h_dI0, xs, ys, types

    def _make_new_traces(self, frame, new_idx, host_pre=None):
        """makeNewTraces: adopt the host half's selection into the
        immature store and upload the block."""
        s = self.s
        h_dI0, xs, ys, types = (host_pre if host_pre is not None
                                else self._new_traces_host(frame))
        M = s.max_immature_per_frame
        st = self.immatures[new_idx]
        n = len(xs)
        # static immature data computed HOST-side from the selector pyramid
        # (numpy twin of make_immature_data) -- no device pull; the device
        # store receives the same values via the set_block upload below
        col = np.zeros((M, 8), np.float32)
        wgt = np.zeros((M, 8), np.float32)
        gradH = np.zeros((M, 2, 2), np.float32)
        ok = np.zeros(M, bool)
        if n:
            col[:n], wgt[:n], gradH[:n], ok[:n] = _host_immature_data(
                h_dI0, xs.astype(np.float32), ys.astype(np.float32)
            )
        st.valid[:n] = ok[:n]
        st.u[:n] = xs
        st.v[:n] = ys
        st.color[:n] = col[:n]
        st.weights[:n] = wgt[:n]
        st.gradH[:n] = gradH[:n]
        st.idepth_min[:n] = 0.0
        st.idepth_max[:n] = np.nan
        st.status[:n] = imm.IPS_UNINITIALIZED
        st.quality[:n] = 10000.0
        st.my_type[:n] = types[:n]
        st.energy_th[:n] = 8 * s.outlier_th * s.overall_energy_th_weight**2

        # upload the new block to the device-resident store (one call)
        new_static = dict(
            u=jnp.asarray(st.u), v=jnp.asarray(st.v),
            color=jnp.asarray(st.color), weights=jnp.asarray(st.weights),
            gradH=jnp.asarray(st.gradH), energy_th=jnp.asarray(st.energy_th),
            my_type=jnp.asarray(st.my_type), valid=jnp.asarray(st.valid),
        )
        new_trace = dict(
            idepth_min=jnp.asarray(st.idepth_min),
            idepth_max=jnp.asarray(st.idepth_max),
            status=jnp.asarray(st.status),
            quality=jnp.asarray(st.quality),
            interval=jnp.asarray(st.pixel_interval),
        )
        self.imm_static, self.imm_trace = imm.set_block(
            self.imm_static, self.imm_trace, jnp.int32(new_idx),
            new_static, new_trace, M,
        )

    # ------------------------------------------------------------------
    def _marginalize_frame(self, idx):
        w = self.window
        p = w.pts
        # publish the departing keyframe's marginalized points with its
        # final pose (reference FullSystemMarginalize.cpp:190-196 +
        # SampleOutputWrapper.h:84-197)
        kfid0 = w.frames[idx].frame_id
        arch = self._marg_points.pop(kfid0, None)
        if arch and self.output_wrappers:
            uvi = np.concatenate(arch)
            pts_w = dmap.key_frame_map(
                uvi[:, 0], uvi[:, 1], uvi[:, 2],
                w.frames[idx].PRE_camToWorld, self.calib.K[0],
            )
            for ow in self.output_wrappers:
                if hasattr(ow, "add_map_points"):
                    ow.add_map_points(pts_w)
        for ow in self.output_wrappers:
            try:
                ow.publish_keyframes([w.frames[idx]], True, w, self.calib)
            except Exception:
                pass
        if kfid0 in self.dense_maps:
            cl = self.dense_maps[kfid0]
            for ow in self.output_wrappers:
                if hasattr(ow, "add_map_points"):
                    ow.add_map_points(
                        cl.world_points(w.frames[idx].PRE_camToWorld, self.calib.K[0])
                    )
        # drop residuals targeting this frame (FullSystemMarginalize :152-215)
        tgt = p.r_exists[:, idx]
        p.r_exists[:, idx] = False
        p.r_active[:, idx] = False
        p.r_linearized[:, idx] = False
        p.r_state[:, idx] = RES_NONE
        fs = w.frames[idx]
        fs.shell.marginalizedAt = self.all_shells[-1].id
        self.frame_pyramids.pop(id(fs), None)
        # TSDF fusion of the departing keyframe's points (setting_tsdf)
        if self.s.tsdf:
            from ..nalo.tsdf import TSDFVolume
            if self.tsdf_volume is None:
                self.tsdf_volume = TSDFVolume(size_m=60.0, resolution=128)
            pm = w.pts
            msk = pm.active & (pm.host == idx) & (pm.idepth > 1e-6)
            if msk.any():
                pts_w = dmap.key_frame_map(
                    pm.u[msk], pm.v[msk], pm.idepth[msk],
                    w.frames[idx].PRE_camToWorld, self.calib.K[0],
                )
                self.tsdf_volume.integrate_points(pts_w)
            kf_id = w.frames[idx].frame_id
            if kf_id in self.dense_maps:
                cl = self.dense_maps[kf_id]
                self.tsdf_volume.integrate_points(
                    cl.world_points(w.frames[idx].PRE_camToWorld, self.calib.K[0])
                )
        w.marginalize_frame(idx)
        del self.immatures[idx]
        del self.kf_masks[idx]
        del self.kf_images[idx]
        del self.kf_bgr[idx]
        F = self.window.F
        perm = np.array(list(range(idx)) + list(range(idx + 1, F)) + [idx])
        self.imm_static, self.imm_trace = imm.shift_down(
            self.imm_static, self.imm_trace, jnp.asarray(perm), F,
            self.s.max_immature_per_frame,
        )
        # the recycled tail block must be invalid
        self._push_imm_valid()

    # ==================================================================
    def rebuild_after_resume(self):
        """Reconstruct the derived runtime state a checkpoint does not
        carry: per-KF pyramids (from the device image stack), host
        intensity images and the coarse-tracking reference, so add_frame
        works immediately after load_checkpoint."""
        w = self.window
        # the checkpoint restored host point arrays wholesale; the lazy
        # device-resident static store must rebuild from them
        w._pts_static_dev = None
        w._pts_static_pending = []
        nf = w.n_frames
        if nf == 0:
            return
        self.frame_pyramids = {}
        for i, fs in enumerate(w.frames):
            dIs, ags = build_pyramid(w.images[i][..., 0], self.calib.levels,
                                     self.gamma_b_grad)
            self.frame_pyramids[id(fs)] = (dIs, ags)
            self.kf_images[i] = np.asarray(w.images[i][..., 0])

        # center projections of active points into the newest KF at the FEJ
        # point (mirrors ba_kernels center_proj), host-side: resume is rare
        p = w.pts
        newest = nf - 1
        fx, fy, cx, cy = w.calib_value
        new_fs = w.frames[newest]
        F = w.F
        R0 = np.tile(np.eye(3, dtype=np.float64), (F, 1, 1))
        t0 = np.zeros((F, 3))
        for h in range(nf):
            l2l0 = new_fs.worldToCam_evalPT * w.frames[h].worldToCam_evalPT.inverse()
            R0[h], t0[h] = l2l0.R, l2l0.t
        KliP = np.stack([(p.u - cx) / fx, (p.v - cy) / fy, np.ones(w.P)], -1)
        ptp0 = (np.einsum("pij,pj->pi", R0[p.host], KliP)
                + t0[p.host] * p.idepth_zero[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            dresc = np.where(ptp0[:, 2] != 0, 1.0 / ptp0[:, 2], 0.0)
        cp = np.stack([
            fx * ptp0[:, 0] * dresc + cx,
            fy * ptp0[:, 1] * dresc + cy,
            p.idepth_zero * dresc,
        ], -1).astype(np.float32)
        w._center_newest_dev = jnp.asarray(cp)
        self._set_tracker_ref(dict(shell=new_fs.shell))

    def trajectory(self):
        """TUM-format rows (printResult :445-499)."""
        rows = []
        for sh in self.all_shells:
            if not sh.poseValid:
                continue
            q = sh.camToWorld.quaternion_xyzw()
            t = sh.camToWorld.t
            rows.append((sh.timestamp, t[0], t[1], t[2], q[0], q[1], q[2], q[3]))
        return rows
