"""A/B gather strategies for the bilinear image sampling that dominates
the immature-trace kernel (32768 pts x 18 steps x 8 pattern on preset-0).

Variants:
  base   -- current interp1 (4 independent 2-D gathers)
  flat   -- 4 independent 1-D gathers on the ravelled image
  quad   -- ONE 1-D gather of precomputed 4-tap rows (H*W, 4)
  quad16 -- quad with f16 payload

Usage: python tools/bench_interp.py
"""

from __future__ import annotations

import os as _os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/nalo_jax_cache_" + _os.environ.get("JAX_PLATFORMS", "axon").split(",")[0])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

H, W = 240, 320
N, S, K = 32768, 18, 8


def _prep(x, y):
    ix = jnp.floor(x)
    iy = jnp.floor(y)
    dx = x - ix
    dy = y - iy
    ix = jnp.clip(ix.astype(jnp.int32), 0, W - 2)
    iy = jnp.clip(iy.astype(jnp.int32), 0, H - 2)
    return ix, iy, dx, dy


@jax.jit
def base(img, x, y):
    ix, iy, dx, dy = _prep(x, y)
    v00 = img[iy, ix]
    v10 = img[iy, ix + 1]
    v01 = img[iy + 1, ix]
    v11 = img[iy + 1, ix + 1]
    return ((1 - dx) * (1 - dy) * v00 + dx * (1 - dy) * v10
            + (1 - dx) * dy * v01 + dx * dy * v11)


@jax.jit
def flat(img, x, y):
    ix, iy, dx, dy = _prep(x, y)
    f = img.reshape(-1)
    i0 = iy * W + ix
    v00 = jnp.take(f, i0)
    v10 = jnp.take(f, i0 + 1)
    v01 = jnp.take(f, i0 + W)
    v11 = jnp.take(f, i0 + W + 1)
    return ((1 - dx) * (1 - dy) * v00 + dx * (1 - dy) * v10
            + (1 - dx) * dy * v01 + dx * dy * v11)


def make_quad(img, dtype):
    """(H*W, 4) rows [v00 v10 v01 v11]; one slice-gather per sample."""
    p = jnp.pad(img, ((0, 1), (0, 1)))
    q = jnp.stack([p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W], p[1:H + 1, 1:W + 1]], -1)
    return q.reshape(H * W, 4).astype(dtype)


@jax.jit
def quad(qimg, x, y):
    ix, iy, dx, dy = _prep(x, y)
    rows = jnp.take(qimg, iy * W + ix, axis=0)  # (..., 4) slice gather
    rows = rows.astype(jnp.float32)
    w = jnp.stack([(1 - dx) * (1 - dy), dx * (1 - dy), (1 - dx) * dy, dx * dy], -1)
    return jnp.sum(rows * w, -1)


@jax.jit
def quad_injit(img, x, y):
    """quad built INSIDE the jit from the (H, W) image: storage format
    unchanged, XLA materializes the (H*W, 4) layout once per call."""
    q = make_quad(img, jnp.float32)
    return quad(q, x, y)


@jax.jit
def base3(img3, x, y):
    ix, iy, dx, dy = _prep(x, y)
    v00 = img3[iy, ix]
    v10 = img3[iy, ix + 1]
    v01 = img3[iy + 1, ix]
    v11 = img3[iy + 1, ix + 1]
    w = ((1 - dx) * (1 - dy), dx * (1 - dy), (1 - dx) * dy, dx * dy)
    return (w[0][..., None] * v00 + w[1][..., None] * v10
            + w[2][..., None] * v01 + w[3][..., None] * v11)


def make_quad3(img3, dtype):
    p = jnp.pad(img3, ((0, 1), (0, 1), (0, 0)))
    q = jnp.stack([p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W],
                   p[1:H + 1, 1:W + 1]], -2)
    return q.reshape(H * W, 4, 3).astype(dtype)


@jax.jit
def quad3(qimg, x, y):
    ix, iy, dx, dy = _prep(x, y)
    rows = jnp.take(qimg, iy * W + ix, axis=0).astype(jnp.float32)  # (...,4,3)
    w = jnp.stack([(1 - dx) * (1 - dy), dx * (1 - dy), (1 - dx) * dy, dx * dy], -1)
    return jnp.sum(rows * w[..., None], -2)


@jax.jit
def quad3_injit(img3, x, y):
    return quad3(make_quad3(img3, jnp.float32), x, y)


def timeit(label, fn, *args, n=5):
    # block_until_ready under-reports on the tunneled runtime; a value
    # pull forces real completion (costs one ~30 ms link RT, identical
    # across variants)
    r = fn(*args); _ = np.asarray(jnp.sum(r))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = np.asarray(jnp.sum(r))
        ts.append(1000 * (time.perf_counter() - t0))
    print(f"{label}: {min(ts):.1f} ms")
    return r


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    x = jnp.asarray(rng.uniform(1, W - 2, size=(N, S, K)).astype(np.float32))
    y = jnp.asarray(rng.uniform(1, H - 2, size=(N, S, K)).astype(np.float32))
    r0 = timeit("base (4x 2-D gather)", base, img, x, y)
    r1 = timeit("flat (4x 1-D take)  ", flat, img, x, y)
    q32 = make_quad(img, jnp.float32)
    r2 = timeit("quad (1x 4-wide)    ", quad, q32, x, y)
    q16 = make_quad(img, jnp.float16)
    r3 = timeit("quad16 (1x 4-wide)  ", quad, q16, x, y)
    r4 = timeit("quad in-jit         ", quad_injit, img, x, y)
    for nm, r in (("flat", r1), ("quad", r2), ("quad16", r3), ("injit", r4)):
        err = float(jnp.max(jnp.abs(r - r0)))
        print(f"  {nm} max err vs base: {err:.5f}")

    img3 = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
    x3 = x[:, :3]   # interp3 call sites sample ~K pattern offsets, not S*K
    y3 = y[:, :3]
    s0 = timeit("base3  (4x 2-D gather, C=3)", base3, img3, x3, y3)
    s1 = timeit("quad3  (1x 12-wide)        ", quad3, make_quad3(img3, jnp.float32), x3, y3)
    s2 = timeit("quad3 in-jit               ", quad3_injit, img3, x3, y3)
    for nm, r in (("quad3", s1), ("injit3", s2)):
        err = float(jnp.max(jnp.abs(r - s0)))
        print(f"  {nm} max err vs base3: {err:.5f}")


if __name__ == "__main__":
    main()
