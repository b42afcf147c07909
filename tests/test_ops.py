import jax.numpy as jnp
import numpy as np
import pytest

# kernel-parity suite: meaningful on real TPU via -m axon (see conftest)
pytestmark = pytest.mark.axon

from nalo_slam_tpu.ops import interp1, interp3, build_pyramid


def test_interp1_exact_grid(rng):
    img = jnp.asarray(rng.normal(size=(16, 20)).astype(np.float32))
    xs = jnp.array([3.0, 5.0, 10.0])
    ys = jnp.array([2.0, 7.0, 11.0])
    vals = interp1(img, xs, ys)
    np.testing.assert_allclose(vals, img[ys.astype(int), xs.astype(int)], atol=1e-6)


def test_interp1_midpoint():
    img = jnp.array([[0.0, 1.0], [2.0, 3.0]])
    v = interp1(img, jnp.array([0.5]), jnp.array([0.5]))
    np.testing.assert_allclose(v, [1.5], atol=1e-6)


def test_interp3_bilinear_plane(rng):
    # a linear ramp is reproduced exactly by bilinear interpolation
    h, w = 12, 15
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([2.0 * xx + 3.0 * yy, xx * 0 + 1.0, yy * 0 + 2.0], -1).astype(np.float32)
    xs = rng.uniform(0, w - 1.01, size=50).astype(np.float32)
    ys = rng.uniform(0, h - 1.01, size=50).astype(np.float32)
    out = interp3(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys))
    np.testing.assert_allclose(out[:, 0], 2.0 * xs + 3.0 * ys, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out[:, 1], 1.0, atol=1e-6)


def test_pyramid_shapes_and_downsample(rng):
    img = rng.uniform(0, 255, size=(64, 96)).astype(np.float32)
    dIs, ags = build_pyramid(jnp.asarray(img), 3)
    assert dIs[0].shape == (64, 96, 3)
    assert dIs[1].shape == (32, 48, 3)
    assert dIs[2].shape == (16, 24, 3)
    # 2x2 average
    manual = 0.25 * (img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2] + img[1::2, 1::2])
    np.testing.assert_allclose(dIs[1][..., 0], manual, atol=1e-4)
    # gradients: central differences
    gx = 0.5 * (img[5, 11] - img[5, 9])
    np.testing.assert_allclose(dIs[0][5, 10, 1], gx, atol=1e-4)
    # absgrad = dx^2+dy^2
    np.testing.assert_allclose(
        ags[0][5, 10], dIs[0][5, 10, 1] ** 2 + dIs[0][5, 10, 2] ** 2, rtol=1e-5
    )


def test_pyramid_gamma_weight(rng):
    img = rng.uniform(0, 255, size=(32, 32)).astype(np.float32)
    bg = np.full(256, 2.0, np.float32)
    _, ag1 = build_pyramid(jnp.asarray(img), 1)
    _, ag2 = build_pyramid(jnp.asarray(img), 1, jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(ag2[0]), 4.0 * np.asarray(ag1[0]), rtol=1e-5)


def test_pallas_grad_kernel_matches_xla(rng):
    """Pallas grad/absgrad kernel (interpret mode on CPU) == plain XLA."""
    from nalo_slam_tpu.ops.pallas_kernels import grad_absgrad
    from nalo_slam_tpu.ops.pyramid import _gradients

    img = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    dx_p, dy_p, ag_p = grad_absgrad(img, interpret=True)
    dx_x, dy_x = _gradients(img)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy_p), np.asarray(dy_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ag_p), np.asarray(dx_x**2 + dy_x**2), rtol=1e-4, atol=1e-2)


def test_build_pyramid_pallas_path_matches(rng):
    """use_pallas=True (interpret on CPU) produces the same pyramid."""
    import jax

    from nalo_slam_tpu.ops.pallas_kernels import grad_absgrad

    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    a = build_pyramid(jnp.asarray(img), 3, use_pallas=False)
    # emulate the pallas path via interpret mode (CPU test env)
    cur = jnp.asarray(img)
    for lvl in range(3):
        if lvl > 0:
            from nalo_slam_tpu.ops.pyramid import _downsample2
            cur = _downsample2(cur)
        dx, dy, ag = grad_absgrad(cur, interpret=True)
        np.testing.assert_allclose(np.asarray(a[0][lvl][..., 1]), np.asarray(dx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a[1][lvl]), np.asarray(ag), rtol=1e-4, atol=1e-2)
