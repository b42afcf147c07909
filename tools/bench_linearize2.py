"""Bisect linearize_residuals stages + layout experiments for accumulation."""

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

from nalo_slam_tpu.backend import ba_kernels as K  # noqa: E402
from nalo_slam_tpu.config import Settings  # noqa: E402


def bench(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:46s} {dt:8.3f} ms")
    return out


def make_inputs(P, F, H, W, rng):
    s = Settings()
    images = jnp.asarray(rng.random((F, H, W, 3)) * 255, jnp.float32)
    kw = dict(
        p_u=jnp.asarray(rng.uniform(5, W - 5, P), jnp.float32),
        p_v=jnp.asarray(rng.uniform(5, H - 5, P), jnp.float32),
        p_idepth=jnp.full(P, 0.3, jnp.float32),
        p_idepth_zero=jnp.full(P, 0.3, jnp.float32),
        p_color=jnp.asarray(rng.random((P, 8)) * 255, jnp.float32),
        p_weights=jnp.ones((P, 8), jnp.float32),
        p_host=jnp.zeros(P, jnp.int32),
        p_energy_th=jnp.full(P, 1e5, jnp.float32),
        r_exists=jnp.ones((P, F), bool),
        r_state=jnp.zeros((P, F), jnp.int32),
        PRE_R0=jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, F, 1, 1)),
        PRE_t0=jnp.tile(jnp.asarray([0.05, 0, 0.01], jnp.float32), (F, F, 1)),
        PRE_KRKi=jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, F, 1, 1)),
        PRE_Kt=jnp.tile(jnp.asarray([0.05, 0, 0.01], jnp.float32), (F, F, 1)),
        PRE_aff=jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (F, F, 1)),
        PRE_b0=jnp.zeros(F, jnp.float32),
        f_energy_th=jnp.full(F, 1e5, jnp.float32),
        calib=jnp.asarray([260.0, 260.0, 159.5, 119.5], jnp.float32),
        outlier_th_sum=s.outlier_th_sum_component,
        huber_th=s.huber_th,
        ab_zero=jnp.zeros(2, jnp.float32),
    )
    return images, kw


def main():
    P, F, H, W = 2048, 8, 240, 320
    rng = np.random.default_rng(0)
    images, kw = make_inputs(P, F, H, W, rng)
    print("platform:", jax.devices()[0].platform)

    full = jax.jit(lambda: K.linearize_residuals(images, **kw))
    bench("full linearize", full)

    # pull out only single outputs -- XLA dead-code-eliminates the rest
    for key in ("Jpdxi", "Jpdc", "resF", "JIdx2", "energy", "new_state",
                "center_proj"):
        f = jax.jit(lambda key=key: K.linearize_residuals(images, **kw)[key])
        bench(f"linearize -> only {key}", f)

    # accumulation layout test: P-last batched matmul vs current
    rows = jnp.asarray(rng.random((P, F, 8, 13)), jnp.float32)
    m = jnp.ones((P, F), jnp.float32)
    host = jnp.zeros(P, jnp.int32)

    def acc_now(rows, m):
        acc_pf = jnp.einsum("pfki,pfkj->pfij", rows, rows, precision="highest")
        acc_pf = acc_pf * m[..., None, None]
        pair = (host[:, None] * F + jnp.arange(F)[None, :]).reshape(-1)
        return jax.ops.segment_sum(acc_pf.reshape(-1, 13, 13), pair,
                                   num_segments=F * F)
    bench("acc current (PF,13,13 segsum)", jax.jit(acc_now), rows, m)

    def acc_mxu(rows, m):
        hot = jax.nn.one_hot(host, F, dtype=jnp.float32)   # (P, Fh)
        # X[h,t,i,(p,k)] contraction over p,k on the MXU:
        # acc[h,t,i,j] = sum_{p,k} hot[p,h] rows[p,t,k,i] rows[p,t,k,j]
        rw = rows * m[..., None, None]
        A = jnp.einsum("ph,ptki->htipk", hot, rw).reshape(F, F, 13, P * 8)
        B = rows.transpose(1, 0, 2, 3).reshape(F, P * 8, 13)
        return jnp.einsum("htix,hxj->htij", A,
                          jnp.broadcast_to(B[None], (F, F, P * 8, 13))[0][None][0] if False else B[jnp.newaxis].repeat(F, 0) if False else B[None].repeat(F, axis=0) if False else B[None][0][None][0][None][0][None][0] if False else B, precision="highest") if False else jnp.einsum("htipk->htip", A.reshape(F, F, 13, P, 8).sum(-1))
    # (abandoned variant above; simpler MXU shape below)

    def acc_mxu2(rows, m):
        # fold (t,k) into rows of a matmul: for each h: (13, P*8t?) ...
        # acc[h,t] = Xt^T diag(hot_h * m[:,t]) Xt with Xt = rows[:, t].reshape(P*8, 13)
        hot = jax.nn.one_hot(host, F, dtype=jnp.float32)   # (P, H)
        X = rows.transpose(1, 0, 2, 3).reshape(F, P * 8, 13)          # (t, P8, 13)
        wgt = (hot[:, :, None] * m[:, None, :]).transpose(2, 1, 0)    # (t, h, P)
        wgt8 = jnp.repeat(wgt, 8, axis=-1)                            # (t, h, P8)
        Y = X[:, None, :, :] * wgt8[..., None]                        # (t, h, P8, 13)
        return jnp.einsum("thxi,txj->htij", Y, X, precision="highest")
    bench("acc MXU (t,h batched matmul)", jax.jit(acc_mxu2), rows, m)

    def acc_bf16(rows, m):
        acc_pf = jnp.einsum("pfki,pfkj->pfij", rows.astype(jnp.bfloat16),
                            rows.astype(jnp.bfloat16))
        acc_pf = acc_pf.astype(jnp.float32) * m[..., None, None]
        pair = (host[:, None] * F + jnp.arange(F)[None, :]).reshape(-1)
        return jax.ops.segment_sum(acc_pf.reshape(-1, 13, 13), pair,
                                   num_segments=F * F)
    bench("acc bf16 outer", jax.jit(acc_bf16), rows, m)


if __name__ == "__main__":
    main()
