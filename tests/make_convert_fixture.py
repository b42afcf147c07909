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


# ---------------------------------------------------------------------------
# Full-model golden: a torch decoder whose state_dict names follow the
# reference checkpoint contract (short_bts.py `bts`: upconv5/bn5/conv5/
# daspp_*/reduc*/get_depth...) and whose forward math is the contract our
# Flax Decoder mirrors.  Used to pin torch_decoder_to_flax /
# load_pretrained_bts end to end.
# ---------------------------------------------------------------------------


class TorchUpconv(tnn.Module):
    def __init__(self, in_ch, out_ch, ratio=2):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False)
        self.ratio = ratio

    def forward(self, x):
        x = tnn.functional.interpolate(x, scale_factor=self.ratio,
                                       mode="nearest")
        return tnn.functional.elu(self.conv(x))


class TorchAtrous(tnn.Module):
    def __init__(self, in_ch, out_ch, dilation, apply_bn_first=True):
        super().__init__()
        self.atrous_conv = tnn.Sequential()
        if apply_bn_first:
            self.atrous_conv.add_module(
                "first_bn", tnn.BatchNorm2d(in_ch, momentum=0.01, eps=1.1e-5))
        self.atrous_conv.add_module(
            "aconv_sequence",
            tnn.Sequential(
                tnn.ReLU(),
                tnn.Conv2d(in_ch, out_ch * 2, 1, bias=False),
                tnn.BatchNorm2d(out_ch * 2, momentum=0.01),
                tnn.ReLU(),
                tnn.Conv2d(out_ch * 2, out_ch, 3,
                           padding=(dilation, dilation), dilation=dilation,
                           bias=False),
            ))

    def forward(self, x):
        return self.atrous_conv(x)


class TorchReduction(tnn.Module):
    """reduction_1x1 with the checkpoint's key names.  NOTE: unlike the
    reference's literal loop (which emits NO head when the starting
    num_out < 4 — impossible at bts_size=512), this always emits the
    plane/final head, matching bts.Reduction1x1 so the tiny test config
    exercises the same structure real checkpoints have."""

    def __init__(self, num_in, num_out, max_depth, is_final=False):
        super().__init__()
        self.max_depth = float(max_depth)
        self.is_final = is_final
        self.reduc = tnn.Sequential()
        while num_out >= 8:
            self.reduc.add_module(
                f"inter_{num_in}_{num_out}",
                tnn.Sequential(tnn.Conv2d(num_in, num_out, 1, bias=False),
                               tnn.ELU()))
            num_in = num_out
            num_out = num_out // 2
        if is_final:
            self.reduc.add_module(
                "final",
                tnn.Sequential(tnn.Conv2d(num_in, 1, 1, bias=False),
                               tnn.Sigmoid()))
        else:
            self.reduc.add_module(
                "plane_params", tnn.Conv2d(num_in, 3, 1, bias=False))

    def forward(self, x):
        net = self.reduc(x)
        if self.is_final:
            return net
        theta = torch.sigmoid(net[:, 0]) * (np.pi / 3)
        phi = torch.sigmoid(net[:, 1]) * (np.pi * 2)
        dist = torch.sigmoid(net[:, 2]) * self.max_depth
        return torch.stack(
            [torch.sin(theta) * torch.cos(phi),
             torch.sin(theta) * torch.sin(phi),
             torch.cos(theta), dist], dim=1)


def _torch_lpg(plane_eq, r):
    pe = torch.repeat_interleave(torch.repeat_interleave(plane_eq, r, 2), r, 3)
    n1, n2, n3, n4 = pe[:, 0], pe[:, 1], pe[:, 2], pe[:, 3]
    _, H, W = n1.shape
    u = ((torch.arange(W).float() % r) - (r - 1) * 0.5) / r
    v = ((torch.arange(H).float() % r) - (r - 1) * 0.5) / r
    return n4 / (n1 * u[None, None, :] + n2 * v[None, :, None] + n3)


class TorchDecoder(tnn.Module):
    def __init__(self, cfg: BtsConfig):
        super().__init__()
        foc = list(cfg.stage_channels)
        nf = cfg.bts_size
        md = cfg.max_depth
        self.max_depth = float(md)
        bn = lambda ch: tnn.BatchNorm2d(ch, momentum=0.01, eps=1.1e-5)
        cv = lambda i, o: tnn.Sequential(
            tnn.Conv2d(i, o, 3, padding=1, bias=False), tnn.ELU())
        self.upconv5 = TorchUpconv(foc[4], nf)
        self.bn5 = bn(nf)
        self.conv5 = cv(nf + foc[3], nf)
        self.upconv4 = TorchUpconv(nf, nf // 2)
        self.bn4 = bn(nf // 2)
        self.conv4 = cv(nf // 2 + foc[2], nf // 2)
        self.bn4_2 = bn(nf // 2)
        self.daspp_3 = TorchAtrous(nf // 2, nf // 4, 3, apply_bn_first=False)
        self.daspp_6 = TorchAtrous(nf // 2 + nf // 4 + foc[2], nf // 4, 6)
        self.daspp_12 = TorchAtrous(nf + foc[2], nf // 4, 12)
        self.daspp_18 = TorchAtrous(nf + nf // 4 + foc[2], nf // 4, 18)
        self.daspp_24 = TorchAtrous(nf + nf // 2 + foc[2], nf // 4, 24)
        self.daspp_conv = cv(nf + nf // 2 + nf // 4, nf // 4)
        self.reduc8x8 = TorchReduction(nf // 4, nf // 4, md)
        self.upconv3 = TorchUpconv(nf // 4, nf // 4)
        self.bn3 = bn(nf // 4)
        self.conv3 = cv(nf // 4 + foc[1] + 1, nf // 4)
        self.reduc4x4 = TorchReduction(nf // 4, nf // 8, md)
        self.upconv2 = TorchUpconv(nf // 4, nf // 8)
        self.bn2 = bn(nf // 8)
        self.conv2 = cv(nf // 8 + foc[0] + 1, nf // 8)
        self.reduc2x2 = TorchReduction(nf // 8, nf // 16, md)
        self.upconv1 = TorchUpconv(nf // 8, nf // 16)
        self.reduc1x1 = TorchReduction(nf // 16, nf // 32, md, is_final=True)
        self.conv1 = cv(nf // 16 + 4, nf // 16)
        self.get_depth = tnn.Sequential(
            tnn.Conv2d(nf // 16, 1, 3, padding=1, bias=False), tnn.Sigmoid())

    def forward(self, skips):
        skip0, skip1, skip2, skip3, dense = skips
        dense = tnn.functional.relu(dense)
        norm = lambda p: tnn.functional.normalize(p[:, :3], 2, 1)
        ds = lambda x, f: tnn.functional.interpolate(x, scale_factor=f,
                                                     mode="nearest")
        i5 = self.conv5(torch.cat([self.bn5(self.upconv5(dense)), skip3], 1))
        cat4 = torch.cat([self.bn4(self.upconv4(i5)), skip2], 1)
        i4 = self.bn4_2(self.conv4(cat4))
        d3 = self.daspp_3(i4)
        c2 = torch.cat([cat4, d3], 1)
        d6 = self.daspp_6(c2)
        c3 = torch.cat([c2, d6], 1)
        d12 = self.daspp_12(c3)
        c4 = torch.cat([c3, d12], 1)
        d18 = self.daspp_18(c4)
        d24 = self.daspp_24(torch.cat([c4, d18], 1))
        daspp = self.daspp_conv(torch.cat([i4, d3, d6, d12, d18, d24], 1))
        pe8 = self.reduc8x8(daspp)
        pe8 = torch.cat([norm(pe8), pe8[:, 3:4]], 1)
        depth8 = _torch_lpg(pe8, 8).unsqueeze(1) / self.max_depth
        i3 = self.conv3(torch.cat([self.bn3(self.upconv3(daspp)), skip1,
                                   ds(depth8, 0.25)], 1))
        pe4 = self.reduc4x4(i3)
        pe4 = torch.cat([norm(pe4), pe4[:, 3:4]], 1)
        depth4 = _torch_lpg(pe4, 4).unsqueeze(1) / self.max_depth
        i2 = self.conv2(torch.cat([self.bn2(self.upconv2(i3)), skip0,
                                   ds(depth4, 0.5)], 1))
        pe2 = self.reduc2x2(i2)
        pe2 = torch.cat([norm(pe2), pe2[:, 3:4]], 1)
        depth2 = _torch_lpg(pe2, 2).unsqueeze(1) / self.max_depth
        up1 = self.upconv1(i2)
        r1 = self.reduc1x1(up1)
        i1 = self.conv1(torch.cat([up1, r1, depth2, depth4, depth8], 1))
        return depth8, depth4, depth2, r1, self.get_depth(i1)


class TorchBts(tnn.Module):
    """Full model with the reference checkpoint's top-level key layout
    (short_bts.py BtsModel: encoder.base_model.*, decoder.*)."""

    def __init__(self, cfg: BtsConfig):
        super().__init__()
        self.encoder = tnn.Module()
        self.encoder.base_model = TorchEncoder(cfg)
        self.decoder = TorchDecoder(cfg)

    def forward(self, x):
        return self.decoder(self.encoder.base_model(x))


def make_golden_full(cfg: BtsConfig):
    """(state_dict, x_nchw, outputs_nhwc[5]) for the full-model golden."""
    tm = TorchBts(cfg).eval()
    _randomize(tm)
    x = torch.randn(1, 3, 64, 96, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        outs = [o.numpy().transpose(0, 2, 3, 1) for o in tm(x)]
    return dict(tm.state_dict()), x.numpy(), outs


def main():
    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures")
    os.makedirs(fixdir, exist_ok=True)

    sd, x, skips = make_golden(BtsConfig.tiny())
    out = {"x": x}
    for i, s in enumerate(skips):
        out[f"skip_{i}"] = s
    for k, v in sd.items():
        out[f"sd:{k}"] = v.numpy()
    path = os.path.join(fixdir, "encoder_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, "
          f"{len(sd)} tensors)")

    sd, x, outs = make_golden_full(BtsConfig.tiny())
    out = {"x": x}
    for i, o in enumerate(outs):
        out[f"out_{i}"] = o
    for k, v in sd.items():
        out[f"sd:{k}"] = v.numpy()
    path = os.path.join(fixdir, "bts_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, "
          f"{len(sd)} tensors)")


if __name__ == "__main__":
    main()
