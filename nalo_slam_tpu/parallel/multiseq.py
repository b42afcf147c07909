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
