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

from ..frontend.tracker import make_track_fn


class MultiSeqTracker:
    """Tracks B sequences in lock-step, batch sharded over 'dp'."""

    def __init__(self, shapes, Ks, settings, mesh: Mesh, affine_mode: int = 0):
        self.mesh = mesh
        self.levels = len(shapes)
        base = make_track_fn(shapes, Ks, settings, affine_mode)
        batched = jax.vmap(base, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))
        dp = NamedSharding(mesh, P("dp"))

        def constrained(*args):
            args = jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, dp), args
            )
            return batched(*args)

        self._fn = jax.jit(constrained)

    def track(self, R0, t0, ab0, ref_maps, ref_colors, new_dIs, exposures, ref_aff):
        """All inputs carry a leading batch axis B (divisible by the mesh
        'dp' size).  ref_maps: tuple per level of (idepth (B,H,W),
        valid (B,H,W)); ref_colors/new_dIs: tuples of (B,H,W[,3])."""
        with jax.sharding.set_mesh(self.mesh):
            return self._fn(R0, t0, ab0, ref_maps, ref_colors, new_dIs,
                            exposures, ref_aff)


class MultiSeqSystem:
    """End-to-end multi-sequence scale-out: B independent FullSystems whose
    per-frame hypothesis-0 pyramid descent (the hot tracking path) runs as
    ONE dp-sharded batched call over the mesh (SURVEY.md §2.4 scale-out
    rows; the reference has no analog).  Each sequence keeps its own
    sliding window / BA; compiled programs are shared across sequences."""

    def __init__(self, settings, calib, n_seq: int, mesh: Mesh | None = None):
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

    def add_frames(self, images, timestamp: float = 0.0, incoming_id: int = -1,
                   exposures=None):
        """Feed frame k of every sequence (images[b] may be None when a
        sequence has ended)."""
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
        maps_b = []
        colors_b = []
        new_b = []
        for lvl in range(L):
            maps_b.append((
                jnp.stack([pend[r][2][2]["maps"][lvl][0] for r in rows]),
                jnp.stack([pend[r][2][2]["maps"][lvl][1] for r in rows]),
            ))
            colors_b.append(jnp.stack([pend[r][2][2]["colors"][lvl] for r in rows]))
            new_b.append(jnp.stack([pend[r][1]["dIs"][lvl] for r in rows]))
        for i, r in enumerate(rows):
            b, frame, (tries, aff0, ref) = pend[r]
            R0[i], t0[i] = tries[0].Rt32()
            ab0[i] = aff0
            exps[i] = (ref["exposure"], frame["exposure"])
            raff[i] = ref["aff"]

        R, t, ab, res, flow, ok = self.tracker.track(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(ab0),
            tuple(maps_b), tuple(colors_b), tuple(new_b),
            jnp.asarray(exps), jnp.asarray(raff),
        )
        R = np.asarray(R); t = np.asarray(t); ab = np.asarray(ab)
        res = np.asarray(res); flow = np.asarray(flow); ok = np.asarray(ok)

        kf_jobs = []
        for i, (b, frame, pre) in enumerate(pend):
            sysb = self.systems[b]
            # repack row i into the single-call packed layout
            packed0 = np.concatenate([
                R[i].reshape(-1), t[i], ab[i], res[i], flow[i],
                np.array([1.0 if ok[i] else 0.0], np.float32),
            ])
            need_kf = sysb.track_only(frame, packed0=packed0, pre=pre)
            if need_kf is None:
                continue
            if need_kf and sysb.s.use_device_opt:
                kf_jobs.append((sysb, frame))
            else:
                sysb.map_frame(frame, need_kf)
        if len(kf_jobs) == 1:
            kf_jobs[0][0].map_frame(kf_jobs[0][1], True)
        elif kf_jobs:
            self._batched_keyframes(kf_jobs)

    def _batched_keyframes(self, jobs):
        """Several sequences decided on a keyframe in the same lock-step:
        run their sliding-window GN as ONE vmapped device program (padded
        to the fixed batch B so a single compiled executable serves every
        keyframe coincidence pattern).  Per-element results are identical
        to the unbatched program: converged/out-of-budget windows freeze
        inside the loop body (device_opt.py)."""
        ctxs = [s._kf_pre(f) for s, f in jobs]
        wins = [s.window for s, _ in jobs]
        # windows too small for the device GN fall back (first KF only)
        small = [i for i, w in enumerate(wins) if w.n_frames < 2]
        if small:
            for (s, f), ctx in zip(jobs, ctxs):
                s._kf_post(ctx, s.window.optimize_device(s.s.max_opt_iterations)
                           if s.window.n_frames >= 2 else 0.0)
            return
        preps = [w.gn_prepare(s.s.max_opt_iterations)
                 for (s, _), w in zip(jobs, wins)]
        opt = wins[0]._dev_opt
        n = len(jobs)
        rows = list(range(n)) + [0] * (self.B - n)   # pad to fixed B
        out = _batched_gn(opt)(
            jnp.stack([wins[r].images for r in rows]),
            {k: jnp.stack([wins[r].jstore[k] for r in rows])
             for k in wins[0].jstore},
            jnp.stack([jnp.asarray(preps[r][0]) for r in rows]),
            jnp.stack([jnp.asarray(preps[r][1]) for r in rows]),
            {k: jnp.stack([preps[r][2][k] for r in rows])
             for k in preps[0][2]},
            jnp.stack([preps[r][3] for r in rows]),
            jnp.asarray([preps[r][4]["max_iters"] for r in rows], jnp.int32),
            jnp.asarray([preps[r][4]["newest"] for r in rows], jnp.int32),
        )
        flat_np = np.asarray(out["flat"], np.float64)
        for i, ((s, f), w, prep, ctx) in enumerate(
                zip(jobs, wins, preps, ctxs)):
            meta = prep[4]
            jst = {k: out["jstore"][k][i] for k in out["jstore"]}
            rmse = w.gn_adopt(flat_np[i], jst, out["res"]["energy"][i],
                              out["center_newest"][i], meta)
            s._kf_post(ctx, rmse)


_BGN_CACHE: dict = {}


def _batched_gn(opt):
    fn = _BGN_CACHE.get(id(opt))
    if fn is None:
        fn = jax.vmap(opt.flat, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))
        _BGN_CACHE[id(opt)] = fn
    return fn
