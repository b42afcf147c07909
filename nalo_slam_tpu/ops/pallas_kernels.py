"""Pallas TPU kernels for the image frontend.

grad_absgrad: central-difference gradients + squared-gradient map of one
pyramid level in a single VMEM pass (the hot per-frame per-level op of
FrameHessian::makeImages, reference HessianBlocks.cpp:164-189 -- the SSE
loop there becomes one fused VPU kernel here).

TPU Mosaic restrictions shape the implementation: borders are built by
concatenation (in-kernel scatter is unsupported) and the 2x2 downsample
stays in XLA (sub-lane strided access is unsupported).  On non-TPU
backends the kernel runs in interpreter mode, so the module is portable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _grad_kernel(img_ref, dx_ref, dy_ref, ag_ref):
    img = img_ref[:]
    h, w = img.shape
    zc = jnp.zeros((h, 1), jnp.float32)
    zr = jnp.zeros((1, w), jnp.float32)
    dx = jnp.concatenate([zc, 0.5 * (img[:, 2:] - img[:, :-2]), zc], axis=1)
    dy = jnp.concatenate([zr, 0.5 * (img[2:, :] - img[:-2, :]), zr], axis=0)
    dx_ref[:] = dx
    dy_ref[:] = dy
    ag_ref[:] = dx * dx + dy * dy


@partial(jax.jit, static_argnames=("interpret",))
def grad_absgrad(img: jnp.ndarray, interpret: bool = False):
    """img (H, W) f32 -> (dx, dy, absgrad), one fused pass."""
    h, w = img.shape
    return pl.pallas_call(
        _grad_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(img.astype(jnp.float32))


def pallas_supported() -> bool:
    return jax.default_backend() not in ("cpu",)
