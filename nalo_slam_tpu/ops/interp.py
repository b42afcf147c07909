"""Bilinear interpolation gathers.

Semantics mirror the reference's getInterpolatedElement31/33
(src/util/globalFuncs.h): ix = floor(x), fractional weights, 4-tap blend.
Indices are clipped for safety; callers are expected to mask out-of-bounds
samples exactly as the reference's guard conditions do.

Shapes are (H, W[, C]) images and arbitrary-batch (...,) coordinates; all
gathers are lane-parallel under vmap/jit.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# Storage dtype of the quad-tap tables.  The (.., 4*C)-minor layout pads
# every row to a 128-lane tile, so the row gather is BANDWIDTH-bound:
# f16 rows (256 B) gather ~3x faster than f32 rows (512 B) on v5e
# (tools/bench_quad_dtype.py: 8.0 vs 2.6 ms per 1M samples).  The blend
# runs in f32 after the gather, so the only change is tap quantization
# (<=0.06 grey at image scale).
#
# That quantization is NOT free everywhere: with f16 taps in the window
# GN the 350-frame parity sequence drifted 0.079 -> 0.35 m ATE (the tap
# error perturbs the FEJ-frozen gradient taps, which accumulates through
# marginalization), so the default stays f32 and f16 is opted into
# per-call-site where the long-horizon parity harness proves it safe
# (the epipolar-search gather: dtype=QUAD_FAST_DTYPE).  Env override
# NALO_QUAD_FAST=0 forces f32 everywhere for bisection.
QUAD_DTYPE = jnp.float32
QUAD_FAST_DTYPE = (
    jnp.float16 if os.environ.get("NALO_QUAD_FAST", "1") != "0"
    else jnp.float32)


def _prep(x, y, h, w):
    ix = jnp.floor(x)
    iy = jnp.floor(y)
    dx = x - ix
    dy = y - iy
    ix = jnp.clip(ix.astype(jnp.int32), 0, w - 2)
    iy = jnp.clip(iy.astype(jnp.int32), 0, h - 2)
    w00 = (1.0 - dx) * (1.0 - dy)
    w10 = dx * (1.0 - dy)
    w01 = (1.0 - dx) * dy
    w11 = dx * dy
    return ix, iy, w00, w10, w01, w11


def build_quad(img: jnp.ndarray, dtype=None):
    """(H, W[, C]) image -> (H*W, 4[*C]) quad-tap table.

    Row q[y*W+x] holds the four bilinear taps [v00 v10 v01 v11] (per
    channel), so a sample needs ONE lane-parallel row gather instead of
    four scalar/C-wide gathers (scalar gathers serialize on TPU; measured
    233 -> 45 ms at 4.7M samples, tools/bench_interp.py).

    Rows are stored at QUAD_DTYPE (f16) unless dtype overrides: the padded
    tile rows make the gather bandwidth-bound, and half-width rows gather
    ~3x faster (see the QUAD_DTYPE note).

    The build is a bandwidth op, but the (.., 4*C)-minor layout tile-pads
    to 128 lanes (~10x bytes): callers whose sampling sits inside a
    while_loop/scan MUST build the quad ONCE outside and pass it to
    interp1q/interp3q -- closed-over values hoist out of loop bodies,
    an in-body build re-materializes the table every iteration (~20 ms
    per build at KITTI-class 1224x368xF8).
    """
    dt = QUAD_DTYPE if dtype is None else dtype
    h, w = img.shape[:2]
    if img.ndim == 2:
        p = jnp.pad(img, ((0, 1), (0, 1)))
        q = jnp.stack(
            [p[:h, :w], p[:h, 1:w + 1], p[1:h + 1, :w], p[1:h + 1, 1:w + 1]],
            -1)
        return q.reshape(h * w, 4).astype(dt)
    c = img.shape[2]
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    q = jnp.stack(
        [p[:h, :w], p[:h, 1:w + 1], p[1:h + 1, :w], p[1:h + 1, 1:w + 1]], -2)
    return q.reshape(h * w, 4 * c).astype(dt)


def interp1q(quad: jnp.ndarray, h: int, w: int, x, y):
    """Bilinear sample from a build_quad table of a (H, W) image."""
    ix, iy, w00, w10, w01, w11 = _prep(x, y, h, w)
    rows = jnp.take(quad, iy * w + ix, axis=0).astype(jnp.float32)
    return (w00 * rows[..., 0] + w10 * rows[..., 1]
            + w01 * rows[..., 2] + w11 * rows[..., 3])


def interp3q(quad: jnp.ndarray, h: int, w: int, x, y):
    """Bilinear sample from a build_quad table of a (H, W, C) image."""
    c = quad.shape[-1] // 4
    ix, iy, w00, w10, w01, w11 = _prep(x, y, h, w)
    rows = jnp.take(quad, iy * w + ix, axis=0).astype(jnp.float32)
    rows = rows.reshape(ix.shape + (4, c))
    # explicit chain == the classic 4-gather form's FP rounding (on f32
    # tables; f16 tables additionally quantize the taps), so the layout
    # change itself is bit-exact (a sum-reduce may reassociate)
    return (
        w00[..., None] * rows[..., 0, :]
        + w10[..., None] * rows[..., 1, :]
        + w01[..., None] * rows[..., 2, :]
        + w11[..., None] * rows[..., 3, :]
    )


def interp1(img: jnp.ndarray, x, y):
    """img (H, W) -> values at (x, y), bilinear, exact f32 taps (quad
    built in place -- do NOT call inside a loop body; see build_quad)."""
    h, w = img.shape
    return interp1q(build_quad(img, dtype=jnp.float32), h, w, x, y)


def interp3(img: jnp.ndarray, x, y):
    """img (H, W, C) -> (..., C) values at (x, y), bilinear, like
    getInterpolatedElement33; exact f32 taps (quad built in place -- do
    NOT call inside a loop body; see build_quad)."""
    h, w = img.shape[:2]
    return interp3q(build_quad(img, dtype=jnp.float32), h, w, x, y)
