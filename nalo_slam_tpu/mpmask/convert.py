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


def _strip_prefix(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _reduction_to_flax(sd, t):
    """Reference ``reduction_1x1`` sub-state-dict -> flax Reduction1x1 tree.

    Torch names (short_bts.py:67-106): ``{t}.reduc.inter_{in}_{out}.0.weight``
    for each halving 1x1+ELU stage (out descending), then either
    ``{t}.reduc.plane_params.weight`` (3-ch plane head) or
    ``{t}.reduc.final.0.weight`` (1-ch sigmoid head).
    """
    import re

    inters = []
    pat = re.compile(re.escape(t) + r"\.reduc\.inter_(\d+)_(\d+)\.0\.weight$")
    for k in sd:
        m = pat.match(k)
        if m:
            inters.append((int(m.group(2)), k))
    inters.sort(key=lambda x: -x[0])   # out-channels descending = decl order
    tree = {}
    ci = 0
    for _, k in inters:
        tree[f"Conv_{ci}"] = {"kernel": _conv_kernel(sd[k])}
        ci += 1
    if f"{t}.reduc.plane_params.weight" in sd:
        tree[f"Conv_{ci}"] = {
            "kernel": _conv_kernel(sd[f"{t}.reduc.plane_params.weight"])}
    elif f"{t}.reduc.final.0.weight" in sd:
        tree[f"Conv_{ci}"] = {
            "kernel": _conv_kernel(sd[f"{t}.reduc.final.0.weight"])}
    else:
        raise KeyError(f"{t}.reduc.(plane_params|final.0).weight")
    return tree


def _atrous_to_flax(sd, t, first_bn):
    """Reference ``atrous_conv`` -> flax AtrousConv tree (params, stats)."""
    p: dict = {}
    s: dict = {}
    bn_i = 0
    if first_bn:
        bp, bs = _bn(sd, f"{t}.atrous_conv.first_bn")
        p[f"BatchNorm_{bn_i}"], s[f"BatchNorm_{bn_i}"] = bp, bs
        bn_i += 1
    p["Conv_0"] = {"kernel": _conv_kernel(
        sd[f"{t}.atrous_conv.aconv_sequence.1.weight"])}
    bp, bs = _bn(sd, f"{t}.atrous_conv.aconv_sequence.2")
    p[f"BatchNorm_{bn_i}"], s[f"BatchNorm_{bn_i}"] = bp, bs
    p["Conv_1"] = {"kernel": _conv_kernel(
        sd[f"{t}.atrous_conv.aconv_sequence.4.weight"])}
    return p, s


def torch_decoder_to_flax(sd):
    """Reference BTS decoder state_dict (names per short_bts.py ``bts``,
    WITHOUT the leading ``decoder.``) -> (params, batch_stats) trees for
    ``bts.Decoder`` (the sub-trees under Decoder_0).

    Flax linen auto-name mapping (instantiation order in Decoder.__call__):

        upconv5.conv -> UpConv_0/Conv_0    bn5   -> BatchNorm_0
        conv5.0      -> Conv_0
        upconv4.conv -> UpConv_1/Conv_0    bn4   -> BatchNorm_1
        conv4.0      -> Conv_1             bn4_2 -> BatchNorm_2
        daspp_3..24  -> AtrousConv_0..4 (first_bn only on 6/12/18/24)
        daspp_conv.0 -> Conv_2
        reduc8x8     -> Reduction1x1_0
        upconv3.conv -> UpConv_2/Conv_0    bn3   -> BatchNorm_3
        conv3.0      -> Conv_3             reduc4x4 -> Reduction1x1_1
        upconv2.conv -> UpConv_3/Conv_0    bn2   -> BatchNorm_4
        conv2.0      -> Conv_4             reduc2x2 -> Reduction1x1_2
        upconv1.conv -> UpConv_4/Conv_0    reduc1x1 -> Reduction1x1_3
        conv1.0      -> Conv_5             get_depth.0 -> Conv_6
    """
    params: dict = {}
    stats: dict = {}

    def up(flax_name, t):
        params[flax_name] = {"Conv_0": {
            "kernel": _conv_kernel(sd[f"{t}.conv.weight"])}}

    def bn(flax_name, t):
        p, s = _bn(sd, t)
        params[flax_name], stats[flax_name] = p, s

    def conv(flax_name, t):
        params[flax_name] = {"kernel": _conv_kernel(sd[f"{t}.weight"])}

    up("UpConv_0", "upconv5"); bn("BatchNorm_0", "bn5"); conv("Conv_0", "conv5.0")
    up("UpConv_1", "upconv4"); bn("BatchNorm_1", "bn4"); conv("Conv_1", "conv4.0")
    bn("BatchNorm_2", "bn4_2")
    for i, d in enumerate((3, 6, 12, 18, 24)):
        p, s = _atrous_to_flax(sd, f"daspp_{d}", first_bn=(d != 3))
        params[f"AtrousConv_{i}"], stats[f"AtrousConv_{i}"] = p, s
    conv("Conv_2", "daspp_conv.0")
    params["Reduction1x1_0"] = _reduction_to_flax(sd, "reduc8x8")
    up("UpConv_2", "upconv3"); bn("BatchNorm_3", "bn3"); conv("Conv_3", "conv3.0")
    params["Reduction1x1_1"] = _reduction_to_flax(sd, "reduc4x4")
    up("UpConv_3", "upconv2"); bn("BatchNorm_4", "bn2"); conv("Conv_4", "conv2.0")
    params["Reduction1x1_2"] = _reduction_to_flax(sd, "reduc2x2")
    up("UpConv_4", "upconv1")
    params["Reduction1x1_3"] = _reduction_to_flax(sd, "reduc1x1")
    conv("Conv_5", "conv1.0"); conv("Conv_6", "get_depth.0")
    return params, stats


def load_pretrained_bts(variables, sd, cfg: BtsConfig | None = None):
    """Merge a FULL reference BTS checkpoint (encoder + decoder; keys
    ``encoder.base_model.*`` / ``decoder.*`` per short_bts.py BtsModel,
    optionally behind a DataParallel ``module.`` prefix) into a
    ``BtsModel.init`` variables pytree, shape-checked entry by entry."""
    sd = {k: v for k, v in sd.items()}
    if any(k.startswith("module.") for k in sd):
        sd = _strip_prefix(sd, "module.")
    enc_sd = _strip_prefix(sd, "encoder.base_model.")
    dec_sd = _strip_prefix(sd, "decoder.")
    if not enc_sd or not dec_sd:
        raise ValueError(
            "not a full BTS checkpoint: expected encoder.base_model.* and "
            "decoder.* keys (got %d/%d)" % (len(enc_sd), len(dec_sd)))
    new = load_pretrained_encoder(variables, enc_sd, cfg)
    dec_p, dec_s = torch_decoder_to_flax(dec_sd)
    _check_tree(new["params"]["Decoder_0"], dec_p, "params/Decoder_0/")
    old_s = new.get("batch_stats", {}).get("Decoder_0", {})
    if old_s:
        _check_tree(old_s, dec_s, "batch_stats/Decoder_0/")
    new["params"] = dict(new["params"])
    new["params"]["Decoder_0"] = dec_p
    if "batch_stats" in new:
        new["batch_stats"] = dict(new["batch_stats"])
        new["batch_stats"]["Decoder_0"] = dec_s
    return new


def _check_tree(old_tree, new_tree, path):
    import jax

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

    _check_tree(old_p, params, "params/Encoder_0/")
    if old_s:
        _check_tree(old_s, stats, "batch_stats/Encoder_0/")

    new["params"] = dict(variables["params"])
    new["params"]["Encoder_0"] = params
    if "batch_stats" in variables:
        new["batch_stats"] = dict(variables["batch_stats"])
        new["batch_stats"]["Encoder_0"] = stats
    return new
