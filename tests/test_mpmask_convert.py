"""torchvision->Flax encoder weight conversion (mpmask/convert.py).

Golden parity: a from-scratch torch module replicating the torchvision
ResNet/ResNeXt layout (same state_dict names, same padding/BN semantics)
is randomly initialised, its state_dict converted, and the Flax encoder
must reproduce the torch skip activations to f32 tolerance.  torchvision
itself is not in this environment; the mini-model IS the layout contract
(torchvision resnet.py Bottleneck: conv1 1x1 -> bn1 -> conv2 3x3 grouped,
stride, pad 1 -> bn2 -> conv3 1x1 -> bn3 -> += downsample(x) -> relu).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from nalo_slam_tpu.mpmask.bts import BtsConfig, BtsModel, Encoder  # noqa: E402
from nalo_slam_tpu.mpmask.convert import (  # noqa: E402
    load_pretrained_encoder,
    torch_encoder_to_flax,
)

CFG = BtsConfig.tiny()


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


def test_encoder_conversion_golden():
    tm = TorchEncoder(CFG).eval()
    _randomize(tm)
    x = torch.randn(1, 3, 64, 96, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        t_skips = [s.numpy().transpose(0, 2, 3, 1) for s in tm(x)]

    params, stats = torch_encoder_to_flax(tm.state_dict(), CFG)
    enc = Encoder(CFG)
    xj = x.numpy().transpose(0, 2, 3, 1)
    f_skips = enc.apply({"params": params, "batch_stats": stats}, xj,
                        train=False)

    assert len(t_skips) == len(f_skips) == 5
    for i, (a, b) in enumerate(zip(t_skips, f_skips)):
        assert a.shape == b.shape, f"skip {i}: {a.shape} vs {b.shape}"
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-4, atol=2e-5,
                                   err_msg=f"skip {i}")


def test_load_pretrained_encoder_merges_and_checks():
    tm = TorchEncoder(CFG).eval()
    _randomize(tm)
    model = BtsModel(CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 96, 3), np.float32), True)
    merged = load_pretrained_encoder(variables, tm.state_dict(), CFG)
    k = np.asarray(merged["params"]["Encoder_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        k, tm.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    # decoder params untouched
    assert merged["params"]["Decoder_0"] is variables["params"]["Decoder_0"]
    # full model still runs with the merged tree
    out = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        np.zeros((1, 64, 96, 3), np.float32), False)
    assert out[-1].shape == (1, 64, 96, 1)

    # a mismatched architecture must be rejected
    bad = dict(tm.state_dict())
    bad["conv1.weight"] = torch.zeros(CFG.stage_channels[0], 3, 5, 5)
    with pytest.raises(ValueError):
        load_pretrained_encoder(variables, bad, CFG)


def test_blocks_inferred_from_state_dict():
    tm = TorchEncoder(CFG).eval()
    _randomize(tm)
    model = BtsModel(CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 96, 3), np.float32), True)
    # cfg=None path: stage_blocks read off the layer names
    merged = load_pretrained_encoder(variables, tm.state_dict(), None)
    assert "Bottleneck_3" in merged["params"]["Encoder_0"]
