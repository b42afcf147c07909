"""Batched multi-sequence tracking, sharded across chips.

BASELINE.json config 5 ("Batched multi-sequence KITTI 00-10: vmapped
tracking, parallel sliding-window BA"): the reference has no analog -- it
is a single-process CPU system -- so this is the TPU scale-out the rebuild
adds (SURVEY.md §2.4, last rows).  Each sequence's coarse-tracking step is
the same jitted pyramid descent as the single-sequence path; sequences are
vmapped into one batch and the batch axis is sharded over the mesh's 'dp'
axis, so B sequences track concurrently with zero cross-talk and XLA keeps
every chip busy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import device_opt as _D
from ..backend.energy import _wo_gn_bucket
from ..frontend import immature as imm
from ..frontend.tracker import make_track_fn
from ..system.full_system import RETRACK_PENDING


class MultiSeqTracker:
    """Tracks B sequences in lock-step, batch sharded over 'dp'."""

    def __init__(self, shapes, Ks, settings, mesh: Mesh, affine_mode: int = 0):
        self.mesh = mesh
        self.levels = len(shapes)
        base = make_track_fn(shapes, Ks, settings, affine_mode)
        batched = jax.vmap(base, in_axes=(0, 0, 0, 0, 0, 0, 0))
        dp = NamedSharding(mesh, P("dp"))

        def constrained(*args):
            args = jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, dp), args
            )
            return batched(*args)

        self._fn = jax.jit(constrained)

    def track(self, R0, t0, ab0, ref_pc, new_dIs, exposures, ref_aff):
        """All inputs carry a leading batch axis B (divisible by the mesh
        'dp' size).  ref_pc: tuple per level of compact_pc leaves, each
        (B, N_l); new_dIs: tuples of (B,H,W,3)."""
        with jax.sharding.set_mesh(self.mesh):
            return self._fn(R0, t0, ab0, ref_pc, new_dIs,
                            exposures, ref_aff)


class MultiSeqSystem:
    """End-to-end multi-sequence scale-out: B independent FullSystems whose
    per-frame hypothesis-0 pyramid descent (the hot tracking path) runs as
    ONE dp-sharded batched call over the mesh (SURVEY.md §2.4 scale-out
    rows; the reference has no analog).  Each sequence keeps its own
    sliding window / BA; compiled programs are shared across sequences."""

    def __init__(self, settings, calib, n_seq: int, mesh: Mesh | None = None,
                 auto_fallback: bool = True):
        from ..system import FullSystem

        self.B = n_seq
        self.calib = calib
        self.systems = [FullSystem(settings, calib) for _ in range(n_seq)]
        f0 = self.systems[0]
        for sb in self.systems[1:]:
            sb._track_fns = f0._track_fns   # one compiled descent for all
        self.levels = calib.levels
        self.tracker = (
            MultiSeqTracker(f0.shapes, f0.Ks, settings, mesh, f0._affine_mode)
            if mesh is not None else None
        )
        # Never-worse guard: lock-step batching wins at its design point
        # (>= one chip per sequence) but on an OVERSUBSCRIBED mesh the
        # batched programs are B/n_dev times the compute per dispatch, and
        # whether that beats B separate dispatch round-trips depends on the
        # link/compute ratio.  When B > mesh size, A/B-probe both execution
        # modes on the live workload right after initialization and keep
        # the faster one for the rest of the run.
        self.lockstep_mode = "batched" if self.tracker is not None else "sequential"
        self._probe = None
        if (self.tracker is not None and auto_fallback
                and n_seq > mesh.devices.size):
            self._probe = dict(phase="bat", skip=1, bat=[], seq=[], n=4)

    def add_frames(self, images, timestamp: float = 0.0, incoming_id: int = -1,
                   exposures=None):
        """Feed frame k of every sequence (images[b] may be None when a
        sequence has ended)."""
        probe = self._probe
        if probe is not None:
            live = [b for b in range(self.B) if images[b] is not None]
            ready = live and all(
                self.systems[b].initialized or self.systems[b].is_lost
                for b in live)
            if ready:
                import time as _time
                t0 = _time.perf_counter()
                if probe["phase"] == "bat":
                    self._add_frames_batched(images, timestamp, incoming_id,
                                             exposures)
                else:
                    self._add_frames_fallback(images, timestamp, incoming_id,
                                              exposures)
                dt = _time.perf_counter() - t0
                if probe["skip"] > 0:
                    probe["skip"] -= 1   # first lock-step of a phase pays
                    return               # compile/cache-load; don't count it
                probe[probe["phase"]].append(dt)
                if probe["phase"] == "bat" and len(probe["bat"]) >= probe["n"]:
                    probe["phase"], probe["skip"] = "seq", 1
                elif len(probe["seq"]) >= probe["n"]:
                    # drop the worst sample of each phase (a keyframe
                    # lock-step) and compare the rest
                    tb = float(np.mean(sorted(probe["bat"])[:-1]))
                    ts = float(np.mean(sorted(probe["seq"])[:-1]))
                    if ts <= tb:
                        self.tracker = None
                        self.lockstep_mode = "sequential(auto)"
                    else:
                        self.lockstep_mode = "batched(auto)"
                    self._probe = None
                return
        return self._add_frames_batched(images, timestamp, incoming_id,
                                        exposures)

    def _add_frames_fallback(self, images, timestamp, incoming_id, exposures):
        """Per-system execution (the single-sequence path for every live
        sequence); compiled programs are still shared via _track_fns."""
        for b, sysb in enumerate(self.systems):
            img = images[b]
            if img is None or sysb.is_lost:
                continue
            exp = float(exposures[b]) if exposures is not None else 1.0
            sysb.add_frame(img, exposure=exp, timestamp=timestamp,
                           incoming_id=incoming_id)

    def _add_frames_batched(self, images, timestamp: float = 0.0,
                            incoming_id: int = -1, exposures=None):
        import numpy as np

        pend = []   # (seq idx, frame, (tries, aff0, ref))
        for b, sysb in enumerate(self.systems):
            img = images[b]
            if img is None or sysb.is_lost:
                continue
            exp = float(exposures[b]) if exposures is not None else 1.0
            if not sysb.initialized or self.tracker is None:
                # initialization (and the mesh-less fallback) stay on the
                # per-system path
                sysb.add_frame(img, exposure=exp, timestamp=timestamp,
                               incoming_id=incoming_id)
                continue
            frame = sysb.prepare_frame(img, exp, timestamp, incoming_id)
            pend.append((b, frame, sysb._track_h0_inputs(frame)))

        if not pend:
            return

        # one sharded batched descent for hypothesis 0 of every live
        # sequence; the batch is padded to B (repeating row 0) so the
        # compiled shape never changes while sequences come and go
        B, L = self.B, self.levels
        rows = list(range(len(pend))) + [0] * (B - len(pend))
        R0 = np.zeros((B, 3, 3), np.float32)
        t0 = np.zeros((B, 3), np.float32)
        ab0 = np.zeros((B, 2), np.float32)
        exps = np.ones((B, 2), np.float32)
        raff = np.zeros((B, 2), np.float32)
        pc_b = []
        new_b = []
        for lvl in range(L):
            pc_b.append(tuple(
                jnp.stack([pend[r][2][2]["pc"][lvl][j] for r in rows])
                for j in range(5)))
            new_b.append(jnp.stack([pend[r][1]["dIs"][lvl] for r in rows]))
        for i, r in enumerate(rows):
            b, frame, (tries, aff0, ref) = pend[r]
            R0[i], t0[i] = tries[0].Rt32()
            ab0[i] = aff0
            exps[i] = (ref["exposure"], frame["exposure"])
            raff[i] = ref["aff"]

        out_dev = self.tracker.track(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(ab0),
            tuple(pc_b), tuple(new_b),
            jnp.asarray(exps), jnp.asarray(raff),
        )
        # deferred traces of the previous lock-step ride as ONE vmapped
        # dispatch BEHIND the descent (so the descent pull below never
        # waits on the epipolar-search kernel) -- the per-system flush in
        # track_only then finds nothing pending
        self._batched_flush_traces([self.systems[b] for b, _, _ in pend])
        R, t, ab, res, flow, ok = (np.asarray(x) for x in out_dev)

        kf_jobs = []
        retrack_sink: list = []
        for i, (b, frame, pre) in enumerate(pend):
            sysb = self.systems[b]
            # repack row i into the single-call packed layout
            packed0 = np.concatenate([
                R[i].reshape(-1), t[i], ab[i], res[i], flow[i],
                np.array([1.0 if ok[i] else 0.0], np.float32),
            ])
            need_kf = sysb.track_only(frame, packed0=packed0, pre=pre,
                                      retrack_sink=retrack_sink)
            if need_kf is RETRACK_PENDING:
                continue   # resumed below after the batched ladder
            self._route_tracked(sysb, frame, need_kf, kf_jobs)
        # every sequence that fell off the fast path runs its 31-hypothesis
        # ladder in the SAME vmapped program (one dispatch, one pull)
        for sysb, frame, need_kf in self._batched_retrack(retrack_sink):
            self._route_tracked(sysb, frame, need_kf, kf_jobs)
        if len(kf_jobs) == 1:
            kf_jobs[0][0].map_frame(kf_jobs[0][1], True)
        elif kf_jobs:
            self._batched_keyframes(kf_jobs)

    def _route_tracked(self, sysb, frame, need_kf, kf_jobs):
        if need_kf is None:
            return
        if need_kf and sysb.s.use_device_opt:
            kf_jobs.append((sysb, frame))
        else:
            sysb.map_frame(frame, need_kf)

    # -- batched deferred-trace flush (one dispatch for B sequences) -------
    def _batched_flush_traces(self, systems):
        jobs = []
        for s in systems:
            with s._trace_dispatch_lock:
                args = s._pending_trace
                s._pending_trace = None
            if args is not None:
                jobs.append((s, args))
        self._dispatch_batched_trace(jobs)

    def _dispatch_batched_trace(self, jobs):
        if not jobs:
            return
        if len(jobs) == 1:
            jobs[0][0]._dispatch_trace(jobs[0][1])
            return
        rows = list(range(len(jobs))) + [0] * (self.B - len(jobs))
        f0 = jobs[0][0]
        out = self._batched_trace_fn(f0)(
            {k: jnp.stack([jobs[r][0].imm_static[k] for r in rows])
             for k in f0.imm_static},
            {k: jnp.stack([jobs[r][0].imm_trace[k] for r in rows])
             for k in f0.imm_trace},
            jnp.stack([jnp.asarray(jobs[r][1][0]) for r in rows]),
            jnp.stack([jnp.asarray(jobs[r][1][1]) for r in rows]),
            jnp.stack([jnp.asarray(jobs[r][1][2]) for r in rows]),
            jnp.stack([jnp.asarray(jobs[r][1][3]) for r in rows]),
            jnp.asarray([jobs[r][0]._next_trace_rot() for r in rows],
                        jnp.int32),
        )
        for i, (s, _) in enumerate(jobs):
            s.imm_trace = {k: out[k][i] for k in out}

    def _batched_trace_fn(self, f0):
        fn = getattr(self, "_trace_fn", None)
        if fn is None:
            s, c = f0.s, f0.calib
            F, M = f0.window.F, s.max_immature_per_frame
            kw = f0._trace_kwargs()

            def base(st, tr, dI0, KRKi, Kt, affs, rot):
                return imm.trace_update(
                    st, tr, dI0, KRKi, Kt, affs, s.max_pix_search,
                    huber_th=s.huber_th, w_img=c.w[0], h_img=c.h[0],
                    F=F, M=M, rot=rot, **kw)

            fn = self._trace_fn = jax.vmap(base, in_axes=(0,) * 7)
        return fn

    # -- batched point activation (one program for coincident keyframes) ---
    def _dispatch_batched_activation(self, act):
        """act: list of (job idx, system, activation prep).  Returns
        [(flat ndarray, new_valid device row), ...] aligned with act."""
        if not act:
            return []
        if len(act) == 1:
            _, s, p = act[0]
            flat_dev, nv = s._activate_dispatch(p)
            return [(np.asarray(flat_dev), nv)]
        rows = list(range(len(act))) + [0] * (self.B - len(act))
        f0 = act[0][1]
        fn = self._batched_act_fn(f0)

        def stk(key, dtype=None):
            a = np.stack([act[r][2][key] for r in rows])
            return jnp.asarray(a if dtype is None else a.astype(dtype))

        flat_b, nv_b = fn(
            {k: jnp.stack([act[r][1].imm_static[k] for r in rows])
             for k in f0.imm_static},
            {k: jnp.stack([act[r][1].imm_trace[k] for r in rows])
             for k in f0.imm_trace},
            jnp.stack([act[r][1].window.images for r in rows]),
            stk("u"), stk("v"), stk("idepth"), stk("host"), stk("m_in"),
            stk("KRKi1"), stk("Kt1f"), stk("flagged"),
            stk("newest", np.int32), stk("min_act_dist", np.float32),
            stk("PRE_R"), stk("PRE_t"), stk("PRE_aff"), stk("f_act"),
            stk("calib"),
        )
        flat_np = np.asarray(flat_b)
        return [(flat_np[i], nv_b[i]) for i in range(len(act))]

    def _batched_act_fn(self, f0):
        fn = getattr(self, "_act_fn", None)
        if fn is None:
            s, c = f0.s, f0.calib
            F, M = f0.window.F, s.max_immature_per_frame
            C, A = f0._ACT_C, f0._ACT_A

            def base(static, trace, images, u, v, idepth, host, m_in,
                     KRKi1, Kt1, flagged, newest, mad,
                     PRE_R, PRE_t, PRE_aff, f_act, calib):
                return imm.activation_run(
                    static, trace, images, u, v, idepth, host, m_in,
                    KRKi1, Kt1, flagged, newest, s.min_trace_quality, mad,
                    PRE_R, PRE_t, PRE_aff, f_act, calib, s.min_idepth_h_act,
                    F=F, M=M, C=C, A=A, h1=c.h[1], w1=c.w[1], dm_iters=40,
                    iters=s.gn_its_on_point_activation, huber_th=s.huber_th,
                    w_img=c.w[0], h_img=c.h[0])

            fn = self._act_fn = jax.vmap(base, in_axes=(0,) * 18)
        return fn

    # -- batched re-track ladder (one program for every fallen sequence) ---
    def _batched_retrack(self, sink):
        if not sink:
            return []
        if len(sink) == 1:
            e = sink[0]
            s = e["sys"]
            packed_w = np.asarray(s._run_retrack(
                e["Rs"], e["ts"], e["abs_"], e["frame"]["dIs"], e["ref"],
                e["packed"]))
            tres = s._retrack_adopt(e["frame"], e["tries"], e["aff0"],
                                    e["ref"], e["best"], packed_w)
            return [(s, e["frame"], s._kf_decision(e["frame"], tres))]
        rows = list(range(len(sink))) + [0] * (self.B - len(sink))
        f0 = sink[0]["sys"]
        fn = getattr(self, "_retrack_fn", None)
        if fn is None:
            fn = self._retrack_fn = jax.vmap(f0._get_retrack_fn(),
                                             in_axes=(0,) * 8)
        L = self.levels
        packed_b = fn(
            jnp.stack([jnp.asarray(sink[r]["Rs"]) for r in rows]),
            jnp.stack([jnp.asarray(sink[r]["ts"]) for r in rows]),
            jnp.stack([jnp.asarray(sink[r]["abs_"]) for r in rows]),
            tuple(tuple(jnp.stack([sink[r]["ref"]["pc"][l][j] for r in rows])
                        for j in range(5))
                  for l in range(L)),
            tuple(jnp.stack([sink[r]["frame"]["dIs"][l] for r in rows])
                  for l in range(L)),
            jnp.stack([jnp.asarray(
                [sink[r]["ref"]["exposure"], sink[r]["frame"]["exposure"]],
                np.float32) for r in rows]),
            jnp.stack([jnp.asarray(sink[r]["ref"]["aff"], np.float32)
                       for r in rows]),
            jnp.stack([jnp.asarray(sink[r]["packed"]) for r in rows]),
        )
        packed_np = np.asarray(packed_b)
        results = []
        for i, e in enumerate(sink):
            s = e["sys"]
            tres = s._retrack_adopt(e["frame"], e["tries"], e["aff0"],
                                    e["ref"], e["best"], packed_np[i])
            results.append((s, e["frame"], s._kf_decision(e["frame"], tres)))
        return results

    def _batched_keyframes(self, jobs):
        """Several sequences decided on a keyframe in the same lock-step:
        the per-KF device programs run as ONE vmapped dispatch each --
        immature trace, point activation, and the sliding-window GN
        (padded to the fixed batch B so a single compiled executable
        serves every coincidence pattern).  Per-element results are
        identical to the unbatched programs: converged/out-of-budget
        windows freeze inside the GN loop body (device_opt.py)."""
        # 1) one vmapped trace for every keyframe (the _kf_stage1 trace
        # stage, hoisted): shell update first, exactly as _kf_stage1 does
        tjobs = []
        for s, f in jobs:
            shell = f["shell"]
            with s.shell_lock:
                if shell.trackingRef is not None:
                    shell.camToWorld = (shell.trackingRef.camToWorld
                                        * shell.camToTrackingRef)
            s.flush_pending_trace()   # no-op after the batched track flush
            tjobs.append((s, s._trace_args(f)))
        self._dispatch_batched_trace(tjobs)
        sts = [s._kf_stage1(f, pre_traced=True) for s, f in jobs]

        # 2) one vmapped activation; the new-KF pixel selection overlaps
        # the device round trip exactly like the single-sequence path
        preps = [s._activate_prepare_timed() for s, _ in jobs]
        act = [(i, s, p) for i, ((s, _), p) in enumerate(zip(jobs, preps))
               if p is not None]
        act_out = self._dispatch_batched_activation(act)
        nt_pres = [[s._new_traces_host(f)] for s, f in jobs]
        for (i, s, p), (flat_np, new_valid) in zip(act, act_out):
            s._activate_adopt(p, flat_np, new_valid)
        ctxs = [s._kf_finish(st, nt)
                for (s, _), st, nt in zip(jobs, sts, nt_pres)]
        wins = [s.window for s, _ in jobs]
        # windows too small for the device GN fall back (first KF only)
        small = [i for i, w in enumerate(wins) if w.n_frames < 2]
        if small:
            for (s, f), ctx in zip(jobs, ctxs):
                s._kf_post(ctx, s.window.optimize_device(s.s.max_opt_iterations)
                           if s.window.n_frames >= 2 else 0.0)
            return
        # shared compaction bucket: the batch is ONE compiled program, so
        # every window must use the same P_eff (the max of their choices)
        bucket = max(_wo_gn_bucket(
            w, int((w.pts.r_exists.any(1) | w.pts.active).sum()))
            for w in wins)
        preps = [w.gn_prepare(s.s.max_opt_iterations, bucket=bucket)
                 for (s, _), w in zip(jobs, wins)]
        n = len(jobs)
        rows = list(range(n)) + [0] * (self.B - n)   # pad to fixed B
        if bucket >= wins[0].P:
            opt = wins[0]._dev_opt
            out = _batched_gn(opt)(
                jnp.stack([wins[r].images for r in rows]),
                {k: jnp.stack([wins[r].jstore[k] for r in rows])
                 for k in wins[0].jstore},
                jnp.stack([jnp.asarray(preps[r][0]) for r in rows]),
                jnp.stack([jnp.asarray(preps[r][1]) for r in rows]),
                {k: jnp.stack([preps[r][3][k] for r in rows])
                 for k in preps[0][3]},
                jnp.stack([preps[r][4] for r in rows]),
                jnp.asarray([preps[r][5]["max_iters"] for r in rows], jnp.int32),
                jnp.asarray([preps[r][5]["newest"] for r in rows], jnp.int32),
            )
            energies = out["res"]["energy"]
        else:
            w0 = wins[0]
            opt = _D.make_device_optimizer_compact(w0.s, w0.F, w0.P, bucket)
            out = _batched_gn(opt)(
                jnp.stack([wins[r].images for r in rows]),
                {k: jnp.stack([wins[r].jstore[k] for r in rows])
                 for k in wins[0].jstore},
                jnp.stack([jnp.asarray(preps[r][0]) for r in rows]),
                jnp.stack([jnp.asarray(preps[r][1]) for r in rows]),
                jnp.stack([jnp.asarray(preps[r][2]) for r in rows]),
                {k: jnp.stack([preps[r][3][k] for r in rows])
                 for k in preps[0][3]},
                jnp.stack([preps[r][4] for r in rows]),
                jnp.asarray([preps[r][5]["max_iters"] for r in rows], jnp.int32),
                jnp.asarray([preps[r][5]["newest"] for r in rows], jnp.int32),
            )
            energies = out["r_energy"]
        # raw f32: the res_bits tail is bitcast-packed (see _wo_gn_adopt)
        flat_np = np.asarray(out["flat"])
        for i, ((s, f), w, prep, ctx) in enumerate(
                zip(jobs, wins, preps, ctxs)):
            meta = prep[5]
            jst = {k: out["jstore"][k][i] for k in out["jstore"]}
            rmse = w.gn_adopt(flat_np[i], jst, energies[i],
                              out["center_newest"][i], meta)
            s._kf_post(ctx, rmse)


_BGN_CACHE: dict = {}


def _batched_gn(opt):
    """vmap the fused GN over the batch; `opt` is either the full-P
    program (call via .flat, 8 args) or a compact wrapper (callable, 9
    args incl. the live-slot index push)."""
    fn = _BGN_CACHE.get(id(opt))
    if fn is None:
        base = getattr(opt, "flat", opt)
        n_args = 8 if hasattr(opt, "flat") else 9
        fn = jax.vmap(base, in_axes=(0,) * n_args)
        _BGN_CACHE[id(opt)] = fn
    return fn
