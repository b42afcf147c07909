"""torchvision->Flax encoder weight conversion (mpmask/convert.py).

Golden parity: a from-scratch torch module replicating the torchvision
ResNet/ResNeXt layout (tests/make_convert_fixture.py:TorchEncoder — the
layout contract for torchvision resnet.py / the reference's
mp_mask/pytorch/bts_my.py encoder) is randomly initialised, its
state_dict converted, and the Flax encoder must reproduce the torch
skip activations to f32 tolerance.

Environments WITHOUT torch run against the vendored golden fixture
(tests/fixtures/encoder_golden.npz — the same module's frozen
state_dict + input + skip activations; regenerate with
`python tests/make_convert_fixture.py`), so the conversion contract is
verified everywhere, torch or not.
"""

import os

import numpy as np
import pytest

try:
    import torch  # noqa: F401
    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False

import jax  # noqa: E402

from nalo_slam_tpu.mpmask.bts import BtsConfig, BtsModel, Encoder  # noqa: E402
from nalo_slam_tpu.mpmask.convert import (  # noqa: E402
    load_pretrained_encoder,
    torch_encoder_to_flax,
)

CFG = BtsConfig.tiny()
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "encoder_golden.npz")


def golden():
    """(state_dict, x_nchw, skips_nhwc): live torch when present, else the
    vendored fixture (same seeds, same module)."""
    if HAS_TORCH:
        from tests.make_convert_fixture import make_golden
        return make_golden(CFG)
    if not os.path.exists(FIXTURE):  # pragma: no cover
        pytest.skip("no torch and no vendored fixture")
    z = np.load(FIXTURE)
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd:")}
    skips = [z[f"skip_{i}"] for i in range(5)]
    return sd, z["x"], skips


def test_encoder_conversion_golden():
    sd, x, t_skips = golden()
    params, stats = torch_encoder_to_flax(sd, CFG)
    enc = Encoder(CFG)
    xj = np.asarray(x).transpose(0, 2, 3, 1)
    f_skips = enc.apply({"params": params, "batch_stats": stats}, xj,
                        train=False)

    assert len(t_skips) == len(f_skips) == 5
    for i, (a, b) in enumerate(zip(t_skips, f_skips)):
        assert a.shape == b.shape, f"skip {i}: {a.shape} vs {b.shape}"
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-4, atol=2e-5,
                                   err_msg=f"skip {i}")


def test_load_pretrained_encoder_merges_and_checks():
    sd, _, _ = golden()
    model = BtsModel(CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 96, 3), np.float32), True)
    merged = load_pretrained_encoder(variables, sd, CFG)
    k = np.asarray(merged["params"]["Encoder_0"]["Conv_0"]["kernel"])
    w = sd["conv1.weight"]
    w = w.numpy() if hasattr(w, "numpy") else w
    np.testing.assert_allclose(k, w.transpose(2, 3, 1, 0))
    # decoder params untouched
    assert merged["params"]["Decoder_0"] is variables["params"]["Decoder_0"]
    # full model still runs with the merged tree
    out = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        np.zeros((1, 64, 96, 3), np.float32), False)
    assert out[-1].shape == (1, 64, 96, 1)

    # a mismatched architecture must be rejected
    bad = dict(sd)
    bad["conv1.weight"] = np.zeros(
        (CFG.stage_channels[0], 3, 5, 5), np.float32)
    with pytest.raises(ValueError):
        load_pretrained_encoder(variables, bad, CFG)


def test_blocks_inferred_from_state_dict():
    sd, _, _ = golden()
    model = BtsModel(CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 96, 3), np.float32), True)
    # cfg=None path: stage_blocks read off the layer names
    merged = load_pretrained_encoder(variables, sd, None)
    assert "Bottleneck_3" in merged["params"]["Encoder_0"]


FIXTURE_FULL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "bts_golden.npz")


def golden_full():
    """(full state_dict, x_nchw, 5 torch outputs nhwc): live torch when
    present, else the vendored full-model fixture."""
    if HAS_TORCH:
        from tests.make_convert_fixture import make_golden_full
        return make_golden_full(CFG)
    if not os.path.exists(FIXTURE_FULL):  # pragma: no cover
        pytest.skip("no torch and no vendored full-model fixture")
    z = np.load(FIXTURE_FULL)
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd:")}
    outs = [z[f"out_{i}"] for i in range(5)]
    return sd, z["x"], outs


def test_full_model_conversion_golden():
    """load_pretrained_bts: full torch BTS checkpoint (encoder + decoder,
    reference key layout) -> Flax BtsModel reproduces all 5 outputs
    (depth8/4/2 LPG maps, reduc1x1, final sigmoid depth)."""
    from nalo_slam_tpu.mpmask.convert import load_pretrained_bts

    sd, x, t_outs = golden_full()
    model = BtsModel(CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 96, 3), np.float32), True)
    merged = load_pretrained_bts(variables, sd, CFG)
    xj = np.asarray(x).transpose(0, 2, 3, 1)
    f_outs = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        xj, False)
    names = ["depth8", "depth4", "depth2", "reduc1x1", "final"]
    assert len(t_outs) == len(f_outs) == 5
    for n, a, b in zip(names, t_outs, f_outs):
        b = np.asarray(b)
        assert a.shape == b.shape, f"{n}: {a.shape} vs {b.shape}"
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4, err_msg=n)


def test_load_pretrained_bts_rejects_partial():
    from nalo_slam_tpu.mpmask.convert import load_pretrained_bts

    sd, _, _ = golden()   # encoder-only state_dict, no decoder.* keys
    model = BtsModel(CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 96, 3), np.float32), True)
    with pytest.raises(ValueError):
        load_pretrained_bts(variables, {f"encoder.base_model.{k}": v
                                        for k, v in sd.items()}, CFG)


def _test_fixture_sync():
    """The vendored fixture must stay in sync with the live module.

    Tolerances are loose-ish on purpose: torch only guarantees RNG/kernel
    reproducibility within a version+platform, so a torch upgrade or BLAS
    backend change may legitimately shift low-order bits.  If this fails
    after an environment change, regenerate with
    `python tests/make_convert_fixture.py`.
    """
    regen = "fixture stale? regenerate: python tests/make_convert_fixture.py"
    sd, x, skips = golden()
    z = np.load(FIXTURE)
    np.testing.assert_allclose(z["x"], x, rtol=1e-5, atol=1e-6, err_msg=regen)
    for i, s in enumerate(skips):
        np.testing.assert_allclose(z[f"skip_{i}"], s, rtol=1e-4, atol=1e-5,
                                   err_msg=regen)
    np.testing.assert_allclose(z["sd:conv1.weight"],
                               sd["conv1.weight"].numpy(),
                               rtol=1e-5, atol=1e-6, err_msg=regen)


if HAS_TORCH and os.path.exists(FIXTURE):
    # only defined where it can run: a no-torch env sees 3/3 pass, 0 skips
    test_fixture_matches_live_torch = _test_fixture_sync
