"""Throughput benchmark of the MP-mask learning stack on the attached
chip: BTS train step (full resnext101-class config, KITTI crop) and
inference, single chip.

Baseline context (BASELINE.md): the reference's PyTorch BTS runs 654 NYU
inference images in ~41 s on an RTX 2080 Ti (~16 img/s); no training
throughput is published.  This prints both for the TPU build.

Usage: python tools/bench_bts.py [batch] [full|tiny]
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


def main():
    from jax.sharding import Mesh

    from nalo_slam_tpu.mpmask.bts import BtsConfig, BtsModel
    from nalo_slam_tpu.mpmask.train import (init_sharded, make_optimizer,
                                            make_train_step)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    variant = sys.argv[2] if len(sys.argv) > 2 else "full"
    H, W = 352, 704   # KITTI crop (reference arguments_train_my.txt)
    cfg = BtsConfig() if variant == "full" else BtsConfig.tiny()
    model = BtsModel(cfg)

    devs = np.array(jax.devices())
    mesh = Mesh(devs.reshape(len(devs), 1), ("dp", "tp"))
    tx = make_optimizer(1e-4, 1000)
    params, stats = init_sharded(model, mesh, (B, H, W, 3))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 60, size=(B, H, W)).astype(np.float32))

    with jax.sharding.set_mesh(mesh):
        # TWO warm steps: the first donation flips the params sharding once,
        # which costs one extra jit(step) compile on the second call
        for _ in range(2):
            params, stats, opt_state, loss = step(params, stats, opt_state, imgs, gt)
        float(loss)   # value sync (block_until_ready under-reports on the
                      # tunneled runtime for donated-buffer chains)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            params, stats, opt_state, loss = step(params, stats, opt_state, imgs, gt)
        float(loss)
        dt = (time.perf_counter() - t0) / n
    print(f"train step ({variant}, B={B}, {H}x{W}): "
          f"{1000*dt:.1f} ms -> {B/dt:.1f} img/s, loss={float(loss):.3f}")

    # inference
    infer = jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x, train=False)[-1])
    out = infer(params, stats, imgs)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = infer(params, stats, imgs)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    print(f"inference ({variant}, B={B}): {1000*dt:.1f} ms -> {B/dt:.1f} img/s "
          f"(reference PyTorch 2080 Ti: ~16 img/s at NYU res)")


if __name__ == "__main__":
    main()
