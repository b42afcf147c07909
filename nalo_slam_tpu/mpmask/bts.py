"""MP-mask depth network: BTS in Flax (NHWC, TPU layout).

Re-implementation of the reference's trimmed BTS
(mp_mask/pytorch/short_bts.py): a CNN encoder producing 5 skip levels, a
dASPP atrous pyramid (:150-163), local planar guidance heads at 8x/4x/2x
(reduction_1x1 :67-106, local_planar_guidance :108-132) and a sigmoid final
depth (:244-248).  The encoder is a ResNeXt-style backbone (the reference
uses torchvision resnext101 per arguments_train_my.txt; grouped convs map
to feature_group_count here) with a configurable width so tests can run a
tiny variant.

Everything is channels-last and built from convolutions XLA tiles onto the
MXU; no torch anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


@dataclass(frozen=True)
class BtsConfig:
    max_depth: float = 80.0
    bts_size: int = 512                    # num_features of the decoder
    stage_channels: Sequence[int] = (64, 256, 512, 1024, 2048)
    stage_blocks: Sequence[int] = (3, 4, 23, 3)   # resnext101-style
    groups: int = 32
    group_width: int = 8
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny() -> "BtsConfig":
        return BtsConfig(
            bts_size=64,
            stage_channels=(16, 32, 64, 128, 256),
            stage_blocks=(1, 1, 1, 1),
            groups=4,
            group_width=4,
        )


class Bottleneck(nn.Module):
    """ResNeXt bottleneck: 1x1 -> grouped 3x3 -> 1x1 + skip."""
    out_ch: int
    stride: int
    groups: int
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inner = self.groups * self.width * (self.out_ch // 256 if self.out_ch >= 256 else 1)
        inner = max(inner, self.out_ch // 2)
        # torch-convention padding ((1,1) both sides on the 3x3, even when
        # strided) and BN eps 1e-5 so torchvision resnext101_32x8d weights
        # convert with exact numerics (short_bts.py:254-306 encoder;
        # mpmask/convert.py)
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                    epsilon=1e-5, dtype=self.dtype)
        h = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = norm()(h)
        h = nn.relu(h)
        h = nn.Conv(inner, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(h)
        h = norm()(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = norm()(h)
        if x.shape[-1] != self.out_ch or self.stride != 1:
            x = nn.Conv(self.out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(h + x)


class Encoder(nn.Module):
    """Backbone emitting skips at 1/2, 1/4, 1/8, 1/16, 1/32 resolution
    (reference encoder :254-306: [relu, layer1..layer4])."""
    cfg: BtsConfig

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.cfg
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                    epsilon=1e-5, dtype=c.dtype)
        # conv1 pad 3/3 and maxpool pad 1/1 per the torch stem, so converted
        # torchvision weights reproduce activations exactly
        h = nn.Conv(c.stage_channels[0], (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=c.dtype)(x)
        h = norm()(h)
        h = nn.relu(h)
        skips = [h]                                  # H/2
        h = nn.max_pool(h, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for si, (ch, nblocks) in enumerate(zip(c.stage_channels[1:], c.stage_blocks)):
            for bi in range(nblocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = Bottleneck(ch, stride, c.groups, c.group_width, c.dtype)(h, train)
            skips.append(h)                          # H/4, H/8, H/16, H/32
        return skips


def _upsample_nearest(x, ratio: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * ratio, w * ratio, c), method="nearest")


class UpConv(nn.Module):
    out_ch: int
    ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _upsample_nearest(x, self.ratio)
        x = nn.Conv(self.out_ch, (3, 3), use_bias=False, dtype=self.dtype)(x)
        return nn.elu(x)


class AtrousConv(nn.Module):
    out_ch: int
    dilation: int
    apply_bn_first: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                    epsilon=1.1e-5, dtype=self.dtype)
        h = x
        if self.apply_bn_first:
            h = norm()(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_ch * 2, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = norm()(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_ch, (3, 3), kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype)(h)
        return h


class Reduction1x1(nn.Module):
    """Plane parameter head (reference reduction_1x1 :67-106)."""
    num_filters: int
    max_depth: float
    is_final: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nf = self.num_filters
        while nf >= 8:
            x = nn.Conv(nf, (1, 1), use_bias=False, dtype=self.dtype)(x)
            x = nn.elu(x)
            nf = nf // 2
        if self.is_final:
            x = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype)(x)
            return nn.sigmoid(x)
        x = nn.Conv(3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        theta = nn.sigmoid(x[..., 0]) * (np.pi / 3)
        phi = nn.sigmoid(x[..., 1]) * (np.pi * 2)
        dist = nn.sigmoid(x[..., 2]) * self.max_depth
        n1 = jnp.sin(theta) * jnp.cos(phi)
        n2 = jnp.sin(theta) * jnp.sin(phi)
        n3 = jnp.cos(theta)
        return jnp.stack([n1, n2, n3, dist], axis=-1)


def local_planar_guidance(plane_eq, upratio: int):
    """Depth from plane parameters, upsampled (reference :108-132).
    plane_eq (B, h, w, 4) -> (B, h*r, w*r)."""
    r = upratio
    pe = jnp.repeat(jnp.repeat(plane_eq, r, axis=1), r, axis=2)
    n1, n2, n3, n4 = pe[..., 0], pe[..., 1], pe[..., 2], pe[..., 3]
    b, H, W = n1.shape
    u = (jnp.arange(W) % r).astype(plane_eq.dtype)
    v = (jnp.arange(H) % r).astype(plane_eq.dtype)
    u = (u - (r - 1) * 0.5) / r
    v = (v - (r - 1) * 0.5) / r
    return n4 / (n1 * u[None, None, :] + n2 * v[None, :, None] + n3)


class Decoder(nn.Module):
    """dASPP + LPG decoder (reference bts :137-252)."""
    cfg: BtsConfig

    @nn.compact
    def __call__(self, skips, train: bool):
        c = self.cfg
        nfeat = c.bts_size
        md = c.max_depth
        dt = c.dtype
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                    epsilon=1.1e-5, dtype=dt)
        skip0, skip1, skip2, skip3, dense = skips
        dense = nn.relu(dense)

        up5 = UpConv(nfeat, dtype=dt)(dense)                      # H/16
        up5 = norm()(up5)
        cat5 = jnp.concatenate([up5, skip3], -1)
        i5 = nn.elu(nn.Conv(nfeat, (3, 3), use_bias=False, dtype=dt)(cat5))

        up4 = UpConv(nfeat // 2, dtype=dt)(i5)                    # H/8
        up4 = norm()(up4)
        cat4 = jnp.concatenate([up4, skip2], -1)
        i4 = nn.elu(nn.Conv(nfeat // 2, (3, 3), use_bias=False, dtype=dt)(cat4))
        i4 = norm()(i4)

        d3 = AtrousConv(nfeat // 4, 3, apply_bn_first=False, dtype=dt)(i4, train)
        cat4_2 = jnp.concatenate([cat4, d3], -1)
        d6 = AtrousConv(nfeat // 4, 6, dtype=dt)(cat4_2, train)
        cat4_3 = jnp.concatenate([cat4_2, d6], -1)
        d12 = AtrousConv(nfeat // 4, 12, dtype=dt)(cat4_3, train)
        cat4_4 = jnp.concatenate([cat4_3, d12], -1)
        d18 = AtrousConv(nfeat // 4, 18, dtype=dt)(cat4_4, train)
        cat4_5 = jnp.concatenate([cat4_4, d18], -1)
        d24 = AtrousConv(nfeat // 4, 24, dtype=dt)(cat4_5, train)
        cat_daspp = jnp.concatenate([i4, d3, d6, d12, d18, d24], -1)
        daspp = nn.elu(nn.Conv(nfeat // 4, (3, 3), use_bias=False, dtype=dt)(cat_daspp))

        pe8 = Reduction1x1(nfeat // 4, md, dtype=dt)(daspp)
        nrm = pe8[..., :3] / (jnp.linalg.norm(pe8[..., :3], axis=-1, keepdims=True) + 1e-12)
        pe8 = jnp.concatenate([nrm, pe8[..., 3:]], -1)
        depth8 = local_planar_guidance(pe8, 8)[..., None] / md    # (B, H, W, 1)
        depth8_ds = depth8[:, ::4, ::4]

        up3 = UpConv(nfeat // 4, dtype=dt)(daspp)                  # H/4
        up3 = norm()(up3)
        cat3 = jnp.concatenate([up3, skip1, depth8_ds], -1)
        i3 = nn.elu(nn.Conv(nfeat // 4, (3, 3), use_bias=False, dtype=dt)(cat3))

        pe4 = Reduction1x1(nfeat // 8, md, dtype=dt)(i3)
        nrm = pe4[..., :3] / (jnp.linalg.norm(pe4[..., :3], axis=-1, keepdims=True) + 1e-12)
        pe4 = jnp.concatenate([nrm, pe4[..., 3:]], -1)
        depth4 = local_planar_guidance(pe4, 4)[..., None] / md
        depth4_ds = depth4[:, ::2, ::2]

        up2 = UpConv(nfeat // 8, dtype=dt)(i3)                     # H/2
        up2 = norm()(up2)
        cat2 = jnp.concatenate([up2, skip0, depth4_ds], -1)
        i2 = nn.elu(nn.Conv(nfeat // 8, (3, 3), use_bias=False, dtype=dt)(cat2))

        pe2 = Reduction1x1(nfeat // 16, md, dtype=dt)(i2)
        nrm = pe2[..., :3] / (jnp.linalg.norm(pe2[..., :3], axis=-1, keepdims=True) + 1e-12)
        pe2 = jnp.concatenate([nrm, pe2[..., 3:]], -1)
        depth2 = local_planar_guidance(pe2, 2)[..., None] / md

        up1 = UpConv(nfeat // 16, dtype=dt)(i2)                    # H
        r1 = Reduction1x1(nfeat // 32, md, is_final=True, dtype=dt)(up1)
        cat1 = jnp.concatenate([up1, r1, depth2, depth4, depth8], -1)
        i1 = nn.elu(nn.Conv(nfeat // 16, (3, 3), use_bias=False, dtype=dt)(cat1))
        final = nn.sigmoid(nn.Conv(1, (3, 3), use_bias=False, dtype=dt)(i1))
        return depth8, depth4, depth2, r1, final


class BtsModel(nn.Module):
    cfg: BtsConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = Encoder(self.cfg)(x, train)
        return Decoder(self.cfg)(skips, train)

    def depth(self, x):
        """Final metric depth (B, H, W)."""
        *_, final = self(x, train=False)
        return final[..., 0] * self.cfg.max_depth
