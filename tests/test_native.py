import time

import numpy as np
import pytest

from nalo_slam_tpu.native import FramePipeline, native_available


def _identity_pipeline(h=48, w=64, gamma=None, vig=None):
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    g = gamma if gamma is not None else np.arange(256, dtype=np.float32)
    return FramePipeline(xx, yy, g, vig, (h, w))


def test_native_builds():
    assert native_available(), "g++ toolchain should build the native pipeline"


def test_identity_remap_matches_gamma():
    p = _identity_pipeline()
    raw = np.random.default_rng(0).integers(0, 256, (48, 64)).astype(np.uint8)
    out = p.process(raw)
    np.testing.assert_allclose(out, raw.astype(np.float32), atol=1e-5)


def test_gamma_and_vignette_applied():
    h, w = 32, 40
    gamma = (np.arange(256, dtype=np.float32)) ** 1.5 / 255**0.5
    vig = np.full((h, w), 2.0, np.float32)
    p = _identity_pipeline(h, w, gamma, vig)
    raw = np.full((h, w), 100, np.uint8)
    out = p.process(raw)
    np.testing.assert_allclose(out, gamma[100] * 2.0, atol=1e-4)


def test_native_matches_numpy_fallback():
    h, w = 40, 56
    rng = np.random.default_rng(1)
    rx = rng.uniform(0, w - 1.01, (h, w)).astype(np.float32)
    ry = rng.uniform(0, h - 1.01, (h, w)).astype(np.float32)
    gamma = np.linspace(0, 255, 256).astype(np.float32)
    vig = rng.uniform(0.5, 2.0, (h, w)).astype(np.float32)
    p = FramePipeline(rx, ry, gamma, vig, (h, w))
    raw = rng.integers(0, 256, (h, w)).astype(np.uint8)
    if not native_available():
        pytest.skip("no native build")
    out_native = p.process(raw)
    out_numpy = p._process_numpy(raw)
    np.testing.assert_allclose(out_native, out_numpy, atol=1e-4)


def test_async_prefetch():
    if not native_available():
        pytest.skip("no native build")
    p = _identity_pipeline()
    raw = np.random.default_rng(2).integers(0, 256, (48, 64)).astype(np.uint8)
    slot = p.submit(raw)
    assert slot >= 0
    for _ in range(200):
        out = p.poll(slot)
        if out is not None:
            break
        time.sleep(0.005)
    assert out is not None
    np.testing.assert_allclose(out, raw.astype(np.float32), atol=1e-5)
