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
            sysb.map_frame(frame, need_kf)
