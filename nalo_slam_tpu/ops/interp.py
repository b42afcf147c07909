"""Bilinear interpolation gathers.

Semantics mirror the reference's getInterpolatedElement31/33
(src/util/globalFuncs.h): ix = floor(x), fractional weights, 4-tap blend.
Indices are clipped for safety; callers are expected to mask out-of-bounds
samples exactly as the reference's guard conditions do.

Shapes are (H, W[, C]) images and arbitrary-batch (...,) coordinates; all
gathers are lane-parallel under vmap/jit.
"""

from __future__ import annotations

import jax.numpy as jnp


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


def build_quad(img: jnp.ndarray):
    """(H, W[, C]) image -> (H*W, 4[*C]) quad-tap table.

    Row q[y*W+x] holds the four bilinear taps [v00 v10 v01 v11] (per
    channel), so a sample needs ONE lane-parallel row gather instead of
    four scalar/C-wide gathers (scalar gathers serialize on TPU; measured
    233 -> 45 ms at 4.7M samples, tools/bench_interp.py).

    The build is a bandwidth op, but the (.., 4*C)-minor layout tile-pads
    to 128 lanes (~10x bytes): callers whose sampling sits inside a
    while_loop/scan MUST build the quad ONCE outside and pass it to
    interp1q/interp3q -- closed-over values hoist out of loop bodies,
    an in-body build re-materializes the table every iteration (~20 ms
    per build at KITTI-class 1224x368xF8).
    """
    h, w = img.shape[:2]
    if img.ndim == 2:
        p = jnp.pad(img, ((0, 1), (0, 1)))
        q = jnp.stack(
            [p[:h, :w], p[:h, 1:w + 1], p[1:h + 1, :w], p[1:h + 1, 1:w + 1]],
            -1)
        return q.reshape(h * w, 4)
    c = img.shape[2]
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    q = jnp.stack(
        [p[:h, :w], p[:h, 1:w + 1], p[1:h + 1, :w], p[1:h + 1, 1:w + 1]], -2)
    return q.reshape(h * w, 4 * c)


def interp1q(quad: jnp.ndarray, h: int, w: int, x, y):
    """Bilinear sample from a build_quad table of a (H, W) image."""
    ix, iy, w00, w10, w01, w11 = _prep(x, y, h, w)
    rows = jnp.take(quad, iy * w + ix, axis=0)
    return (w00 * rows[..., 0] + w10 * rows[..., 1]
            + w01 * rows[..., 2] + w11 * rows[..., 3])


def interp3q(quad: jnp.ndarray, h: int, w: int, x, y):
    """Bilinear sample from a build_quad table of a (H, W, C) image."""
    c = quad.shape[-1] // 4
    ix, iy, w00, w10, w01, w11 = _prep(x, y, h, w)
    rows = jnp.take(quad, iy * w + ix, axis=0).reshape(ix.shape + (4, c))
    # explicit chain == the classic 4-gather form's FP rounding, so the
    # layout change is bit-exact (a sum-reduce may reassociate)
    return (
        w00[..., None] * rows[..., 0, :]
        + w10[..., None] * rows[..., 1, :]
        + w01[..., None] * rows[..., 2, :]
        + w11[..., None] * rows[..., 3, :]
    )


def interp1(img: jnp.ndarray, x, y):
    """img (H, W) -> values at (x, y), bilinear (quad built in place --
    do NOT call inside a loop body; see build_quad)."""
    h, w = img.shape
    return interp1q(build_quad(img), h, w, x, y)


def interp3(img: jnp.ndarray, x, y):
    """img (H, W, C) -> (..., C) values at (x, y), bilinear, like
    getInterpolatedElement33 (quad built in place -- do NOT call inside a
    loop body; see build_quad)."""
    h, w = img.shape[:2]
    return interp3q(build_quad(img), h, w, x, y)
