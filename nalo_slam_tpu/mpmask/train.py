"""MP-mask training: silog loss, AdamW, poly LR, sharded train step.

Replaces the reference's PyTorch trainers (mp_mask/pytorch/bts_my.py for the
single-host loop, bts_main.py for the torch.distributed/NCCL DDP variant):
the TPU-native equivalent of DDP's gradient all-reduce is a jitted train
step over a jax.sharding.Mesh -- the batch is sharded over the 'dp' axis,
large convolution kernels over 'tp' (output channels), and XLA inserts the
psum/all-gather collectives over ICI.

silog loss: sqrt(mean(d^2) - variance_focus * mean(d)^2) * 5 with
d = log(est) - log(gt) over valid-gt pixels (short_bts.py:25-32, use at
bts_my.py:248-254).  Poly LR decay (1 - step/total)^0.9 (bts_my.py:257).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .bts import BtsConfig, BtsModel


def silog_loss(depth_est, depth_gt, mask, variance_focus: float = 0.85):
    d = jnp.where(mask, jnp.log(jnp.maximum(depth_est, 1e-6))
                  - jnp.log(jnp.maximum(depth_gt, 1e-6)), 0.0)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    m2 = jnp.sum(d * d) / n
    m1 = jnp.sum(d) / n
    return jnp.sqrt(jnp.maximum(m2 - variance_focus * m1 * m1, 1e-12)) * 5.0


def make_optimizer(lr: float, total_steps: int, weight_decay: float = 1e-2):
    sched = optax.polynomial_schedule(
        init_value=lr, end_value=lr * 0.01, power=0.9, transition_steps=total_steps
    )
    return optax.adamw(sched, weight_decay=weight_decay, eps=1e-3)


def param_sharding_rules(params, mesh: Mesh):
    """Shard large conv kernels over 'tp' (last/output-channel dim); small
    tensors replicated.  Returns a pytree of NamedShardings."""
    tp = mesh.shape.get("tp", 1)

    def rule(x):
        if x.ndim == 4 and x.shape[-1] % tp == 0 and x.shape[-1] >= tp * 8:
            return NamedSharding(mesh, P(None, None, None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def make_train_step(model: BtsModel, tx, mesh: Mesh):
    """Returns a jitted train step: (params, batch_stats, opt_state, images,
    depth_gt) -> (params, batch_stats, opt_state, loss).

    images (B, H, W, 3) sharded (dp, sp, None, None); depth_gt (B, H, W).
    """
    img_shard = NamedSharding(mesh, P("dp", None, None, None))
    gt_shard = NamedSharding(mesh, P("dp", None, None))

    def loss_fn(params, batch_stats, images, depth_gt):
        outs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        *_, final = outs
        depth = final[..., 0] * model.cfg.max_depth
        mask = depth_gt > 0.1
        loss = silog_loss(depth, depth_gt, mask)
        return loss, updates["batch_stats"]

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, images, depth_gt):
        images = jax.lax.with_sharding_constraint(images, img_shard)
        depth_gt = jax.lax.with_sharding_constraint(depth_gt, gt_shard)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, depth_gt
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def init_sharded(model: BtsModel, mesh: Mesh, input_shape, seed: int = 0):
    """Initialize params with tp sharding applied."""
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros(input_shape, jnp.float32), train=False)
    )(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    shardings = param_sharding_rules(params, mesh)
    params = jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
    rep = NamedSharding(mesh, P())
    batch_stats = jax.tree.map(lambda x: jax.device_put(x, rep), batch_stats)
    return params, batch_stats
