"""Decompose linearize_residuals + accumulate_top cost on the device."""

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


def bench(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:46s} {dt:8.3f} ms")
    return out


def main():
    P, F, H, W = 2048, 8, 240, 320
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((F, H, W, 3)) * 255, jnp.float32)
    Ku = jnp.asarray(rng.uniform(2, W - 3, (P, F, 8)), jnp.float32)
    Kv = jnp.asarray(rng.uniform(2, H - 3, (P, F, 8)), jnp.float32)
    print("platform:", jax.devices()[0].platform)

    # A: the vmapped gather as in linearize_residuals
    def gA(images, Ku, Kv):
        return jax.vmap(lambda im, x, y: interp3(im, x, y),
                        in_axes=(0, 1, 1), out_axes=1)(images, Ku, Kv)
    bench("A vmap-over-F gather (P,F,8)", jax.jit(gA), images, Ku, Kv)

    # B: flat gather from one big image (frame folded into rows)
    def gB(images, Ku, Kv):
        imgflat = images.reshape(F * H, W, 3)
        yoff = (jnp.arange(F, dtype=jnp.float32) * H)[None, :, None]
        return interp3(imgflat, Ku.reshape(P, F, 8),
                       (Kv + yoff).reshape(P, F, 8))
    bench("B folded-rows gather", jax.jit(gB), images, Ku, Kv)

    # C: outer-product einsum chain (rows 13x13), precision=highest
    rows = jnp.asarray(rng.random((P, F, 8, 13)), jnp.float32)
    m = jnp.ones((P, F), jnp.float32)
    host = jnp.zeros(P, jnp.int32)

    def accHI(rows, m):
        acc_pf = jnp.einsum("pfki,pfkj->pfij", rows, rows, precision="highest")
        acc_pf = acc_pf * m[..., None, None]
        pair = (host[:, None] * F + jnp.arange(F)[None, :]).reshape(-1)
        return jax.ops.segment_sum(acc_pf.reshape(-1, 13, 13), pair,
                                   num_segments=F * F)
    bench("C acc 13x13 precision=highest", jax.jit(accHI), rows, m)

    def accDF(rows, m):
        acc_pf = jnp.einsum("pfki,pfkj->pfij", rows, rows)
        acc_pf = acc_pf * m[..., None, None]
        pair = (host[:, None] * F + jnp.arange(F)[None, :]).reshape(-1)
        return jax.ops.segment_sum(acc_pf.reshape(-1, 13, 13), pair,
                                   num_segments=F * F)
    bench("C acc 13x13 default precision", jax.jit(accDF), rows, m)

    def accMAT(rows, m):
        # one-hot pair matmul instead of segment_sum: (FF, PF8) @ (PF8, 169)
        rw = (rows * jnp.sqrt(m)[..., None, None]).reshape(P * F, 8, 13)
        outer = jnp.einsum("nki,nkj->nij", rw, rw).reshape(P * F, 169)
        pair = (host[:, None] * F + jnp.arange(F)[None, :]).reshape(-1)
        sel = jax.nn.one_hot(pair, F * F, dtype=jnp.float32)  # (PF, FF)
        return (sel.T @ outer).reshape(F * F, 13, 13)
    bench("C acc 13x13 one-hot matmul", jax.jit(accMAT), rows, m)

    # D: the geometry jacobian block alone
    KliP = jnp.asarray(rng.random((P, 3)), jnp.float32)
    R0 = jnp.tile(jnp.eye(3, dtype=jnp.float32), (P, F, 1, 1))
    t0_ = jnp.asarray(rng.random((P, F, 3)), jnp.float32)

    def geom(R0, t0_, KliP):
        ptp0 = jnp.einsum("pfij,pj->pfi", R0, KliP, precision="highest") + t0_
        drescale = 1.0 / ptp0[..., 2]
        u0 = ptp0[..., 0] * drescale
        v0 = ptp0[..., 1] * drescale
        Jp = jnp.stack([u0 * v0, 1 + u0 * u0, v0, drescale, u0, v0 * u0], -1)
        return Jp
    bench("D geometry block", jax.jit(geom), R0, t0_, KliP)

    # E: 26 copies of JIdx2-style inner products
    JIdx = jnp.asarray(rng.random((P, F, 2, 8)), jnp.float32)

    def inner(JIdx):
        a = jnp.einsum("pfik,pfjk->pfij", JIdx, JIdx, precision="highest")
        b = jnp.einsum("pfik,pfjk->pfij", JIdx, JIdx, precision="highest")
        return a, b
    bench("E pattern inner products x2", jax.jit(inner), JIdx)

    # F: accumulate_sc's accD einsum
    Jm = jnp.asarray(rng.random((P, F, 8)), jnp.float32)
    HdiF = jnp.asarray(rng.random(P), jnp.float32)
    hot = jax.nn.one_hot(host, F, dtype=jnp.float32)

    def scD(hot, HdiF, Jm):
        return jnp.einsum("ph,p,pti,puj->htuij", hot, HdiF, Jm, Jm,
                          precision="highest")
    bench("F accD einsum highest", jax.jit(scD), hot, HdiF, Jm)

    def scD2(hot, HdiF, Jm):
        return jnp.einsum("ph,p,pti,puj->htuij", hot, HdiF, Jm, Jm)
    bench("F accD einsum default", jax.jit(scD2), hot, HdiF, Jm)


if __name__ == "__main__":
    main()
