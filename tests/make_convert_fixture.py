"""Torch-side golden model + fixture generator for the converter test.

Defines a from-scratch torch module replicating the torchvision
ResNet/ResNeXt layout (same state_dict names, same padding/BN semantics
— torchvision resnet.py Bottleneck: conv1 1x1 -> bn1 -> conv2 3x3
grouped, stride, pad 1 -> bn2 -> conv3 1x1 -> bn3 -> += downsample(x)
-> relu; the reference's encoder operating point is
mp_mask/pytorch/bts_my.py:encoder resnext101).

Run as a script (needs torch) to regenerate
tests/fixtures/encoder_golden.npz — the frozen state_dict + input +
skip activations that let tests/test_mpmask_convert.py verify the
conversion contract in environments WITHOUT torch.
"""

import os
import sys

import numpy as np
import torch
import torch.nn as tnn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nalo_slam_tpu.mpmask.bts import BtsConfig  # noqa: E402


def _inner(out_ch, groups, width):
    # must match bts.Bottleneck's width rule (== torchvision's for
    # resnext101_32x8d: width = planes*base_width/64*groups = out_ch)
    inner = groups * width * (out_ch // 256 if out_ch >= 256 else 1)
    return max(inner, out_ch // 2)


class TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, out_ch, stride, groups, width):
        super().__init__()
        inner = _inner(out_ch, groups, width)
        self.conv1 = tnn.Conv2d(in_ch, inner, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(inner)
        self.conv2 = tnn.Conv2d(inner, inner, 3, stride=stride, padding=1,
                                groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(inner)
        self.conv3 = tnn.Conv2d(inner, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU(inplace=True)
        if in_ch != out_ch or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


class TorchEncoder(tnn.Module):
    """torchvision-resnet-shaped encoder emitting the 5 BTS skips."""

    def __init__(self, cfg: BtsConfig):
        super().__init__()
        c = cfg
        self.conv1 = tnn.Conv2d(3, c.stage_channels[0], 7, stride=2,
                                padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(c.stage_channels[0])
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        in_ch = c.stage_channels[0]
        for li, (ch, nb) in enumerate(zip(c.stage_channels[1:], c.stage_blocks)):
            blocks = []
            for b in range(nb):
                stride = 2 if (b == 0 and li > 0) else 1
                blocks.append(TorchBottleneck(in_ch, ch, stride,
                                              c.groups, c.group_width))
                in_ch = ch
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        skips = [h]
        h = self.maxpool(h)
        for li in range(1, 5):
            h = getattr(self, f"layer{li}")(h)
            skips.append(h)
        return skips


def _randomize(m):
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for b in m.modules():
            if isinstance(b, tnn.BatchNorm2d):
                b.running_mean.copy_(
                    torch.randn(b.running_mean.shape, generator=g) * 0.1)
                b.running_var.copy_(
                    torch.rand(b.running_var.shape, generator=g) * 0.5 + 0.5)


def make_golden(cfg: BtsConfig):
    """(state_dict, x_nchw numpy, skips_nhwc numpy) for the golden test."""
    tm = TorchEncoder(cfg).eval()
    _randomize(tm)
    x = torch.randn(1, 3, 64, 96, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        skips = [s.numpy().transpose(0, 2, 3, 1) for s in tm(x)]
    return dict(tm.state_dict()), x.numpy(), skips


def main():
    sd, x, skips = make_golden(BtsConfig.tiny())
    out = {"x": x}
    for i, s in enumerate(skips):
        out[f"skip_{i}"] = s
    for k, v in sd.items():
        out[f"sd:{k}"] = v.numpy()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "encoder_golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, "
          f"{len(sd)} tensors)")


if __name__ == "__main__":
    main()
