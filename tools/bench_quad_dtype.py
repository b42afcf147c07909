"""A/B: quad-table row gather at f32 vs f16 storage.

The (.., 4*C)-minor quad layout tile-pads to 128 lanes, so every gathered
row moves a full 512-byte (f32) or 256-byte (f16) tile row.  If the
gather is bandwidth-bound rather than issue-bound, f16 storage halves the
row cost; the blend still runs in f32 after an upcast (the images already
ride the link as f16, so table quantization adds nothing new).

Usage: python tools/bench_quad_dtype.py
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

from nalo_slam_tpu.ops.interp import build_quad  # noqa: E402


def main():
    H, W, C = 368, 1224, 3
    N = 4_000_000
    rng = np.random.default_rng(0)
    img = rng.normal(size=(H, W, C)).astype(np.float32) * 50 + 128
    x = rng.uniform(1, W - 3, size=N).astype(np.float32)
    y = rng.uniform(1, H - 3, size=N).astype(np.float32)

    def run(dtype):
        q = jnp.asarray(build_quad(jnp.asarray(img)), dtype)

        @jax.jit
        def sample(q, x, y):
            ix = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
            iy = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
            dx = x - ix
            dy = y - iy
            rows = jnp.take(q, iy * W + ix, axis=0).astype(jnp.float32)
            rows = rows.reshape(N, 4, C)
            w00 = (1 - dx) * (1 - dy)
            w10 = dx * (1 - dy)
            w01 = (1 - dx) * dy
            w11 = dx * dy
            v = (w00[:, None] * rows[:, 0] + w10[:, None] * rows[:, 1]
                 + w01[:, None] * rows[:, 2] + w11[:, None] * rows[:, 3])
            return jnp.sum(v, axis=0)

        xd, yd = jnp.asarray(x), jnp.asarray(y)
        # value pull, not block_until_ready: the tunneled runtime
        # under-reports readiness on fused chains (ROADMAP, BTS bench)
        out = np.asarray(sample(q, xd, yd))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(sample(q, xd, yd))
            ts.append(1000 * (time.perf_counter() - t0))
        return np.median(ts), out

    t32, v32 = run(jnp.float32)
    t16, v16 = run(jnp.float16)
    tb16, vb16 = run(jnp.bfloat16)
    print(f"f32 table:  {t32:.1f} ms / 1M samples")
    print(f"f16 table:  {t16:.1f} ms  (err vs f32: "
          f"{np.abs(v16 - v32).max() / N:.2e} per-sample mean-scale)")
    print(f"bf16 table: {tb16:.1f} ms  (err vs f32: "
          f"{np.abs(vb16 - v32).max() / N:.2e})")


if __name__ == "__main__":
    main()
