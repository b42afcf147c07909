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


def interp1(img: jnp.ndarray, x, y):
    """img (H, W) -> values at (x, y), bilinear.

    Fetches the four taps as ONE 4-wide row gather from a (H*W, 4) quad
    layout built in-jit (pad+stack, ~free at image sizes) instead of four
    scalar gathers: on TPU scalar gathers serialize while slice gathers
    ride the lane axis -- measured 233 -> 45 ms at 4.7M samples on the
    epipolar-search shape, bit-exact (tools/bench_interp.py).  The C=3
    interp3 keeps the plain form: its per-tap gather is already a 3-wide
    slice and the quad layout wins nothing there.
    """
    h, w = img.shape
    ix, iy, w00, w10, w01, w11 = _prep(x, y, h, w)
    p = jnp.pad(img, ((0, 1), (0, 1)))
    q = jnp.stack(
        [p[:h, :w], p[:h, 1:w + 1], p[1:h + 1, :w], p[1:h + 1, 1:w + 1]], -1
    ).reshape(h * w, 4)
    rows = jnp.take(q, iy * w + ix, axis=0)
    return (w00 * rows[..., 0] + w10 * rows[..., 1]
            + w01 * rows[..., 2] + w11 * rows[..., 3])


def interp3(img: jnp.ndarray, x, y):
    """img (H, W, C) -> (..., C) values at (x, y), bilinear.

    Used on dI stacks (intensity, ddx, ddy) like getInterpolatedElement33.
    Same quad trick as interp1: ONE (4*C)-wide row gather from a
    (H*W, 4*C) layout built in-jit instead of four C-wide gathers
    (52.8 -> 33.7 ms at the 1M-sample BA-linearize shape, bit-exact --
    the build is a cheap bandwidth op XLA fuses with the pad).  The
    clipped ix<=w-2, iy<=h-2 indices never touch the zero pad row/col.
    """
    h, w = img.shape[:2]
    c = img.shape[2]
    ix, iy, w00, w10, w01, w11 = _prep(x, y, h, w)
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    q = jnp.stack(
        [p[:h, :w], p[:h, 1:w + 1], p[1:h + 1, :w], p[1:h + 1, 1:w + 1]], -2
    ).reshape(h * w, 4 * c)
    rows = jnp.take(q, iy * w + ix, axis=0).reshape(ix.shape + (4, c))
    # explicit chain == the classic 4-gather form's FP rounding, so the
    # layout change is bit-exact (a sum-reduce may reassociate)
    return (
        w00[..., None] * rows[..., 0, :]
        + w10[..., None] * rows[..., 1, :]
        + w01[..., None] * rows[..., 2, :]
        + w11[..., None] * rows[..., 3, :]
    )
