"""torchvision -> Flax weight conversion for the BTS encoder.

The reference loads ImageNet-pretrained torchvision backbones into its BTS
encoder (reference mp_mask/pytorch/short_bts.py:254-306; the trained
operating point uses resnext101_32x8d per arguments_train_my.txt).  This
module maps a torchvision ResNet/ResNeXt ``state_dict`` onto the Flax
``Encoder`` in bts.py so the same pretrained weights drive the TPU model.

No download happens here (and torchvision is not required): pass a
state_dict loaded from any ``.pth`` file, e.g.

    import torch
    sd = torch.load("resnext101_32x8d-8ba56ff5.pth", map_location="cpu")
    variables = load_pretrained_encoder(variables, sd)

The Flax encoder was built with torch padding conventions (conv1 pad 3,
maxpool pad 1, bottleneck 3x3 pad 1) and BN eps 1e-5 so converted weights
reproduce torch activations bit-for-bit in f32 (tests/test_mpmask_convert.py
pins this against a from-scratch torch forward).

Name mapping (torchvision ResNet -> bts.Encoder, flax linen auto-names):

    conv1.weight                 -> Encoder_0/Conv_0.kernel        (OIHW->HWIO)
    bn1.*                        -> Encoder_0/BatchNorm_0.*
    layer{L}.{B}.conv{1,2,3}     -> Encoder_0/Bottleneck_{i}/Conv_{0,1,2}
    layer{L}.{B}.bn{1,2,3}       -> Encoder_0/Bottleneck_{i}/BatchNorm_{0,1,2}
    layer{L}.{B}.downsample.0/.1 -> Encoder_0/Bottleneck_{i}/Conv_3 / BatchNorm_3

with i the bottleneck index cumulative over layers (layer1 first).
fc.* (the ImageNet classifier head) is ignored.
"""

from __future__ import annotations

import numpy as np

from .bts import BtsConfig


def _np(t):
    """torch tensor / numpy array -> numpy f32."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv_kernel(w):
    """torch conv weight (O, I/g, kH, kW) -> flax kernel (kH, kW, I/g, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def _bn(sd, prefix):
    return (
        {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])},
        {"mean": _np(sd[prefix + ".running_mean"]),
         "var": _np(sd[prefix + ".running_var"])},
    )


def torch_encoder_to_flax(sd, cfg: BtsConfig):
    """torchvision ResNet/ResNeXt state_dict -> (params, batch_stats) trees
    for ``bts.Encoder`` (the sub-trees under Encoder_0).

    Raises KeyError with the missing torch tensor name if the state_dict
    does not match ``cfg``'s architecture.
    """
    params: dict = {}
    stats: dict = {}

    params["Conv_0"] = {"kernel": _conv_kernel(sd["conv1.weight"])}
    p, s = _bn(sd, "bn1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s

    bi = 0
    for li, nblocks in enumerate(cfg.stage_blocks, start=1):
        for b in range(nblocks):
            t = f"layer{li}.{b}"
            f = f"Bottleneck_{bi}"
            bp: dict = {}
            bs: dict = {}
            for ci in range(3):
                bp[f"Conv_{ci}"] = {
                    "kernel": _conv_kernel(sd[f"{t}.conv{ci + 1}.weight"])}
                p, s = _bn(sd, f"{t}.bn{ci + 1}")
                bp[f"BatchNorm_{ci}"], bs[f"BatchNorm_{ci}"] = p, s
            if f"{t}.downsample.0.weight" in sd:
                bp["Conv_3"] = {
                    "kernel": _conv_kernel(sd[f"{t}.downsample.0.weight"])}
                p, s = _bn(sd, f"{t}.downsample.1")
                bp["BatchNorm_3"], bs["BatchNorm_3"] = p, s
            params[f] = bp
            stats[f] = bs
            bi += 1

    return params, stats


def load_pretrained_encoder(variables, sd, cfg: BtsConfig | None = None):
    """Merge a torchvision backbone state_dict into a full BtsModel
    ``variables`` pytree (as returned by ``BtsModel.init``).  Shapes are
    checked against the existing tree entry by entry."""
    import jax

    if cfg is None:
        # infer stage_blocks from the state_dict itself
        blocks = []
        for li in range(1, 5):
            b = 0
            while f"layer{li}.{b}.conv1.weight" in sd:
                b += 1
            blocks.append(b)
        cfg = BtsConfig(stage_blocks=tuple(blocks))
    params, stats = torch_encoder_to_flax(sd, cfg)

    new = {k: dict(v) for k, v in variables.items()}  # shallow copy top levels
    old_p = variables["params"]["Encoder_0"]
    old_s = variables.get("batch_stats", {}).get("Encoder_0", {})

    def _check(old_tree, new_tree, path):
        of = jax.tree_util.tree_leaves_with_path(old_tree)
        nf = jax.tree_util.tree_leaves_with_path(new_tree)
        om = {jax.tree_util.keystr(k): v for k, v in of}
        nm = {jax.tree_util.keystr(k): v for k, v in nf}
        if set(om) != set(nm):
            missing = set(om) ^ set(nm)
            raise ValueError(f"{path}: tree mismatch at {sorted(missing)[:6]}")
        for k in om:
            if tuple(om[k].shape) != tuple(nm[k].shape):
                raise ValueError(
                    f"{path}{k}: shape {tuple(nm[k].shape)} != expected "
                    f"{tuple(om[k].shape)} — state_dict does not match cfg")

    _check(old_p, params, "params/Encoder_0/")
    if old_s:
        _check(old_s, stats, "batch_stats/Encoder_0/")

    new["params"] = dict(variables["params"])
    new["params"]["Encoder_0"] = params
    if "batch_stats" in variables:
        new["batch_stats"] = dict(variables["batch_stats"])
        new["batch_stats"]["Encoder_0"] = stats
    return new
