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
    wts = jnp.stack([w00, w10, w01, w11], -1)
    return jnp.sum(rows * wts, -1)


def interp3(img: jnp.ndarray, x, y):
    """img (H, W, C) -> (..., C) values at (x, y), bilinear.

    Used on dI stacks (intensity, ddx, ddy) like getInterpolatedElement33.
    """
    h, w = img.shape[:2]
    ix, iy, w00, w10, w01, w11 = _prep(x, y, h, w)
    v00 = img[iy, ix]
    v10 = img[iy, ix + 1]
    v01 = img[iy + 1, ix]
    v11 = img[iy + 1, ix + 1]
    return (
        w00[..., None] * v00
        + w10[..., None] * v10
        + w01[..., None] * v01
        + w11[..., None] * v11
    )
