"""Microbenchmarks of the hot device kernels on the attached accelerator.

Times each kernel with jax.block_until_ready after a warmup, so numbers are
device compute (plus one dispatch), not tunnel transfer.

Usage: python tools/microbench.py
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def bench(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:50s} {dt:8.2f} ms")
    return dt


def main():
    from nalo_slam_tpu.config import Settings
    from nalo_slam_tpu.frontend import immature as imm
    from nalo_slam_tpu.ops import build_pyramid

    s = Settings()
    H, W = 240, 320
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W)) * 255, jnp.float32)
    dI, _ = build_pyramid(img, 1)
    dI0 = dI[0]

    print(f"platform: {jax.devices()[0].platform}")

    # pyramid build
    pyr = jax.jit(lambda x: build_pyramid(x, 4))
    bench("build_pyramid L4", pyr, img)

    # trace_update at several slot counts
    for F, M in ((8, 1024), (4, 1024), (8, 512), (8, 256)):
        static, trace = imm.empty_device_state(F, M)
        N = F * M
        static = dict(
            static,
            u=jnp.asarray(rng.uniform(5, W - 5, N), jnp.float32),
            v=jnp.asarray(rng.uniform(5, H - 5, N), jnp.float32),
            color=jnp.asarray(rng.random((N, 8)) * 255, jnp.float32),
            weights=jnp.ones((N, 8), jnp.float32),
            gradH=jnp.tile(jnp.eye(2, dtype=jnp.float32) * 100, (N, 1, 1)),
            valid=jnp.ones(N, bool),
        )
        trace = dict(trace, idepth_min=jnp.zeros(N, jnp.float32),
                     idepth_max=jnp.full(N, jnp.nan, jnp.float32))
        KRKi = jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, 1, 1))
        Kt = jnp.tile(jnp.asarray([0.05, 0.0, 0.01], jnp.float32), (F, 1))
        affs = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (F, 1))
        ns = imm.n_steps_for(W, H, s.max_pix_search)
        fn = lambda st, tr: imm.trace_update(
            st, tr, dI0, KRKi, Kt, affs, s.max_pix_search,
            huber_th=s.huber_th, w_img=W, h_img=H, F=F, M=M, n_steps=ns)
        bench(f"trace_update F={F} M={M} (N={N}, steps={ns})", fn, static, trace)

    # linearize_residuals (the BA inner kernel)
    from nalo_slam_tpu.backend import ba_kernels as K
    P, F = 2048, 8
    images = jnp.asarray(rng.random((F, H, W, 3)) * 255, jnp.float32)
    pre = dict(
        PRE_R0=jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, F, 1, 1)),
        PRE_t0=jnp.tile(jnp.asarray([0.05, 0, 0.01], jnp.float32), (F, F, 1)),
        PRE_KRKi=jnp.tile(jnp.eye(3, dtype=jnp.float32), (F, F, 1, 1)),
        PRE_Kt=jnp.tile(jnp.asarray([0.05, 0, 0.01], jnp.float32), (F, F, 1)),
        PRE_aff=jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (F, F, 1)),
        PRE_b0=jnp.zeros(F, jnp.float32),
    )
    lin = jax.jit(lambda: K.linearize_residuals(
        images,
        jnp.asarray(rng.uniform(5, W - 5, P), jnp.float32),
        jnp.asarray(rng.uniform(5, H - 5, P), jnp.float32),
        jnp.full(P, 0.3, jnp.float32), jnp.full(P, 0.3, jnp.float32),
        jnp.asarray(rng.random((P, 8)) * 255, jnp.float32),
        jnp.ones((P, 8), jnp.float32),
        jnp.zeros(P, jnp.int32), jnp.full(P, 1e5, jnp.float32),
        jnp.ones((P, F), bool), jnp.zeros((P, F), jnp.int32),
        **pre,
        f_energy_th=jnp.full(F, 1e5, jnp.float32),
        calib=jnp.asarray([260.0, 260.0, 159.5, 119.5], jnp.float32),
        outlier_th_sum=s.outlier_th_sum_component,
        huber_th=s.huber_th,
        ab_zero=jnp.zeros(2, jnp.float32),
    ))
    bench(f"linearize_residuals P={P} F={F}", lin)

    # accumulate_top + accumulate_sc
    jstore = {k: jnp.zeros((P, F) + sh, jnp.float32) for k, sh in
              dict(Jpdxi=(2, 6), Jpdc=(2, 4), Jpdd=(2,), JIdx=(2, 8),
                   JabF=(2, 8), resF=(8,), JIdx2=(2, 2), JabJIdx=(2, 2),
                   Jab2=(2, 2), res_toZero=(8,)).items()}
    mask = jnp.ones((P, F), bool)
    host = jnp.zeros(P, jnp.int32)
    acc = jax.jit(lambda: K.accumulate_top(jstore, jstore["resF"], mask, host, F))
    bench(f"accumulate_top P={P} F={F}", acc)
    jj = jax.jit(lambda: K.accumulate_sc(
        K.compute_JpJdF(jstore, F), jnp.zeros((P, 4), jnp.float32),
        jnp.zeros(P, jnp.float32), jnp.zeros(P, jnp.float32), mask, host, F))
    bench(f"accumulate_sc P={P} F={F}", jj)

    # coarse tracker single descent
    import __graft_entry__ as g
    fn, args = g.entry()
    jfn = jax.jit(fn)
    bench("coarse track full pyramid descent", jfn, *args)


if __name__ == "__main__":
    main()
