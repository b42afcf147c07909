"""A/B: XLA gather-based bilinear sampling vs one-hot-matmul sampling.

The SLAM hot kernels (BA linearization, tracker, trace) are dominated by
bilinear image sampling at scattered coordinates.  XLA lowers those gathers
to slow scalar-ish code on TPU; the MXU alternative is sampling via one-hot
matmuls (exact 0/1 row/col selectors, f32 blend).

Usage: python tools/bench_gather.py
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
    "/tmp/nalo_jax_cache_" + _os.environ.get("JAX_PLATFORMS", "axon").split(",")[0],
)
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from nalo_slam_tpu.ops.interp import interp3  # noqa: E402


def onehot_interp3(img, x, y):
    """Bilinear sample of img (H, W, C) at flat coords x, y (N,) via
    one-hot matmuls (MXU path)."""
    H, W, C = img.shape
    ix = jnp.clip(jnp.floor(x), 0, W - 2)
    iy = jnp.clip(jnp.floor(y), 0, H - 2)
    dx = (x - ix)[:, None]
    dy = (y - iy)[:, None]
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    # row selector with bilinear row blend folded in: (N, H)
    Ry = ((rows[None, :] == iy[:, None]) * (1 - dy)
          + (rows[None, :] == iy[:, None] + 1) * dy)
    Cx = ((cols[None, :] == ix[:, None]) * (1 - dx)
          + (cols[None, :] == ix[:, None] + 1) * dx)
    T = jnp.einsum("nh,hwc->nwc", Ry, img)          # (N, W, C) matmul
    return jnp.einsum("nw,nwc->nc", Cx, T)


def onehot_interp3_b(img, x, y):
    """Variant: columns via matmul first (W contraction), then rows."""
    H, W, C = img.shape
    ix = jnp.clip(jnp.floor(x), 0, W - 2)
    iy = jnp.clip(jnp.floor(y), 0, H - 2)
    dx = (x - ix)[:, None]
    dy = (y - iy)[:, None]
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    Ry = ((rows[None, :] == iy[:, None]) * (1 - dy)
          + (rows[None, :] == iy[:, None] + 1) * dy)      # (N, H)
    Cx = ((cols[None, :] == ix[:, None]) * (1 - dx)
          + (cols[None, :] == ix[:, None] + 1) * dx)      # (N, W)
    T = jnp.einsum("nw,hwc->nhc", Cx, img)                # (N, H, C)
    return jnp.einsum("nh,nhc->nc", Ry, T)


def bench(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {dt:8.3f} ms")
    return out


def main():
    H, W, C = 240, 320, 3
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, C)) * 255, jnp.float32)
    print(f"platform: {jax.devices()[0].platform}")
    for N in (16384, 131072):
        x = jnp.asarray(rng.uniform(1, W - 2, N), jnp.float32)
        y = jnp.asarray(rng.uniform(1, H - 2, N), jnp.float32)
        f_g = jax.jit(interp3)
        f_o = jax.jit(onehot_interp3)
        f_b = jax.jit(onehot_interp3_b)
        a = bench(f"gather interp3      N={N}", f_g, img, x, y)
        b = bench(f"one-hot interp3(RC) N={N}", f_o, img, x, y)
        c = bench(f"one-hot interp3(CR) N={N}", f_b, img, x, y)
        print("   max|diff RC|:", float(jnp.max(jnp.abs(a - b))),
              " max|diff CR|:", float(jnp.max(jnp.abs(a - c))))


if __name__ == "__main__":
    main()
