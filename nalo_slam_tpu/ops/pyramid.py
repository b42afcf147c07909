"""Image pyramid with gradients and squared-gradient maps.

TPU-native equivalent of FrameHessian::makeImages
(reference: src/FullSystem/HessianBlocks.cpp:127-190):

* level 0 intensity = input image (photometrically corrected upstream),
* level l intensity = 2x2 average of level l-1,
* gradients = central differences (0.5*(right-left), 0.5*(down-up)),
* absSquaredGrad = dx^2 + dy^2, optionally re-weighted by the gamma
  response derivative B'(I)^2 (HessianBlocks.cpp:180-186).

Returns per-level (H, W, 3) "dI" stacks [I, dx, dy] plus (H, W) abs-grad
maps.  Everything is one jitted function per image geometry; XLA fuses the
average/diff/square chain into a couple of HBM passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gradients(img: jnp.ndarray):
    """Central differences with zeroed borders (selector skips borders)."""
    dx = jnp.zeros_like(img)
    dy = jnp.zeros_like(img)
    dx = dx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    dy = dy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return dx, dy


def _downsample2(img: jnp.ndarray):
    h, w = img.shape
    return 0.25 * (
        img[0 : h - 1 : 2, 0 : w - 1 : 2]
        + img[0 : h - 1 : 2, 1:w:2]
        + img[1:h:2, 0 : w - 1 : 2]
        + img[1:h:2, 1:w:2]
    )


@partial(jax.jit, static_argnames=("levels", "use_pallas"))
def build_pyramid(image: jnp.ndarray, levels: int, b_grad: jnp.ndarray | None = None,
                  use_pallas: bool | None = None):
    """image (H, W) float32 -> (dI levels, absgrad levels).

    b_grad: optional (256,) LUT of the gamma-response derivative B'(I); when
    given, absSquaredGrad *= B'(I)^2 per pixel (reference
    HessianBlocks.cpp:180-186, setting_gammaWeightsPixelSelect).

    use_pallas=True runs the gradient/absgrad pass as the fused Pallas
    VMEM kernel (ops/pallas_kernels.py).  Measured on v5e the XLA fusion of
    this op already matches the hand kernel (2.5 vs 3.1 ms at 320x240x3
    levels, the kernel boundary blocks cross-level fusion), so XLA stays
    the default; the kernel is validated on hardware and kept as the
    template for ops XLA cannot fuse.
    """
    from .pallas_kernels import grad_absgrad

    if use_pallas is None:
        use_pallas = False
    dIs = []
    absgrads = []
    img = image.astype(jnp.float32)
    for lvl in range(levels):
        if lvl > 0:
            img = _downsample2(img)
        if use_pallas:
            dx, dy, ag = grad_absgrad(img)
        else:
            dx, dy = _gradients(img)
            ag = dx * dx + dy * dy
        dI = jnp.stack([img, dx, dy], axis=-1)
        if b_grad is not None:
            idx = jnp.clip(img.astype(jnp.int32), 0, 255)
            gw = b_grad[idx]
            ag = ag * gw * gw
        dIs.append(dI)
        absgrads.append(ag)
    return tuple(dIs), tuple(absgrads)
