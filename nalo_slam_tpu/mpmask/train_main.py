"""MP-mask trainer CLI.

Rebuild of the reference trainers (mp_mask/pytorch/bts_my.py single-host,
bts_main.py torch.distributed/NCCL): one entry point that trains the Flax
BTS net with the mesh-sharded step (dp x tp; jax.distributed covers
multi-host DCN when launched once per host).

Usage:
  python -m nalo_slam_tpu.mpmask.train_main \
      --list train_files.txt --data-root <dir> [--gt-root <dir>] \
      [--batch 4] [--steps 1000] [--lr 1e-4] [--ckpt ckpts/] \
      [--tp 1] [--multihost]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--gt-root", default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=1e-2)
    ap.add_argument("--ckpt", default="mpmask_ckpts")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--crop-h", type=int, default=352)
    ap.add_argument("--crop-w", type=int, default=1216)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    ap.add_argument("--log", default=None,
                    help="jsonl training-curve stream (step, silog, it/s)")
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() for multi-host DCN")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.multihost:
        jax.distributed.initialize()

    from ..parallel.mesh import make_mesh
    from .bts import BtsConfig, BtsModel
    from .data import MaskDataset
    from .infer import save_checkpoint
    from .train import init_sharded, make_optimizer, make_train_step

    cfg = BtsConfig.tiny() if args.tiny else BtsConfig()
    model = BtsModel(cfg)
    mesh = make_mesh(tp=args.tp)
    ds = MaskDataset(args.list, args.data_root, args.gt_root,
                     crop_hw=(args.crop_h, args.crop_w), train=True)
    params, stats = init_sharded(model, mesh, (1, args.crop_h, args.crop_w, 3))
    tx = make_optimizer(args.lr, args.steps, args.weight_decay)
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx, mesh)

    step = 0
    t0 = time.time()
    logf = open(args.log, "a") if args.log else None
    with jax.sharding.set_mesh(mesh):
        while step < args.steps:
            for imgs, gts in ds.batches(args.batch):
                params, stats, opt_state, loss = step_fn(
                    params, stats, opt_state,
                    jnp.asarray(imgs), jnp.asarray(gts),
                )
                step += 1
                if step % 10 == 0 or step == 1:
                    rate = step / (time.time() - t0)
                    print(f"step {step}: silog {float(loss):.4f} "
                          f"({rate:.2f} it/s)", flush=True)
                    if logf:
                        import json as _json
                        logf.write(_json.dumps(dict(
                            step=step, silog=round(float(loss), 5),
                            it_per_s=round(rate, 3))) + "\n")
                        logf.flush()
                if step % args.ckpt_every == 0 or step >= args.steps:
                    save_checkpoint(args.ckpt, params, stats, step)
                if step >= args.steps:
                    break
    if logf:
        logf.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
