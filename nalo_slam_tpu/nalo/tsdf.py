"""TSDF volume fusion as dense voxel scatter ops.

Replaces the reference's cpu_tsdf::TSDFVolumeOctree (instantiated at
src/FullSystem/FullSystem.cpp:192-198; 10m^3 volume).  The octree becomes
a dense voxel grid updated with jnp scatter-adds -- regular memory access
is what the TPU wants, and a 256^3 f32 grid is 64 MB of HBM.

integrate_points: splat world points with weight accumulation (the
reference's effective pipeline streams world points to PCD and fuses
externally, FullSystem.cpp:1510-1559 commented integration; we provide the
actual fusion).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class TSDFVolume:
    def __init__(self, size_m: float = 10.0, resolution: int = 256,
                 trunc_dist: float = 0.08, origin=None):
        self.size = size_m
        self.res = resolution
        self.voxel = size_m / resolution
        # truncation must cover at least a couple of voxels
        self.trunc = max(trunc_dist, 2.0 * self.voxel)
        self.origin = np.asarray(origin if origin is not None else
                                 [-size_m / 2, -size_m / 2, -size_m / 2])
        self.tsdf = jnp.ones((resolution,) * 3, jnp.float32)
        self.weight = jnp.zeros((resolution,) * 3, jnp.float32)

    def integrate_depth(self, depth: np.ndarray, K: np.ndarray, cam_to_world,
                        max_depth: float = 30.0):
        """Project every voxel into the depth map and update SDF (classic
        Curless-Levoy voxel-projective fusion, batched on device)."""
        R = jnp.asarray(cam_to_world.R, jnp.float32)
        t = jnp.asarray(cam_to_world.t, jnp.float32)
        self.tsdf, self.weight = _integrate_depth(
            self.tsdf, self.weight, jnp.asarray(depth, jnp.float32),
            jnp.asarray(K, jnp.float32), R, t,
            jnp.asarray(self.origin, jnp.float32),
            self.voxel, self.trunc, max_depth,
        )

    def integrate_points(self, world_pts: np.ndarray):
        """Point-splat fusion: set SDF ~ 0 near measured surface points."""
        self.tsdf, self.weight = _integrate_points(
            self.tsdf, self.weight, jnp.asarray(world_pts, jnp.float32),
            jnp.asarray(self.origin, jnp.float32), self.voxel,
        )

    def occupied_points(self, th: float = 0.5) -> np.ndarray:
        """Voxel centers with |tsdf| < th and weight > 0 (surface shell)."""
        t = np.asarray(self.tsdf)
        w = np.asarray(self.weight)
        iz, iy, ix = np.nonzero((np.abs(t) < th) & (w > 0))
        return self.origin + (np.stack([ix, iy, iz], 1) + 0.5) * self.voxel


@partial(jax.jit, static_argnames=("voxel", "trunc", "max_depth"))
def _integrate_depth(tsdf, weight, depth, K, R, t, origin, voxel: float,
                     trunc: float, max_depth: float):
    res = tsdf.shape[0]
    idx = jnp.arange(res, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
    pts_w = origin + jnp.stack([xx, yy, zz], -1) * voxel + 0.5 * voxel
    # world -> cam
    Rt = R.T
    pts_c = jnp.einsum("ij,abcj->abci", Rt, pts_w - t)
    z = pts_c[..., 2]
    h, w = depth.shape
    u = (K[0, 0] * pts_c[..., 0] / z + K[0, 2]).astype(jnp.int32)
    v = (K[1, 1] * pts_c[..., 1] / z + K[1, 2]).astype(jnp.int32)
    inb = (z > 0.05) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    d = depth[jnp.clip(v, 0, h - 1), jnp.clip(u, 0, w - 1)]
    valid = inb & (d > 0.05) & (d < max_depth)
    sdf = (d - z) / trunc
    upd = valid & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)
    w_new = weight + upd.astype(jnp.float32)
    tsdf_new = jnp.where(
        upd, (tsdf * weight + sdf) / jnp.maximum(w_new, 1.0), tsdf
    )
    return tsdf_new, w_new


@jax.jit
def _integrate_points(tsdf, weight, pts, origin, voxel):
    res = tsdf.shape[0]
    ijk = jnp.floor((pts - origin) / voxel).astype(jnp.int32)
    ok = jnp.all((ijk >= 0) & (ijk < res), axis=1)
    ijk = jnp.where(ok[:, None], ijk, 0)
    weight2 = weight.at[ijk[:, 2], ijk[:, 1], ijk[:, 0]].add(ok.astype(jnp.float32))
    # surface voxels pull to zero SDF where hit
    tsdf2 = tsdf.at[ijk[:, 2], ijk[:, 1], ijk[:, 0]].min(jnp.where(ok, 0.0, 1.0))
    return tsdf2, weight2
