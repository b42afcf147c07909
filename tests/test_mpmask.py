import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from nalo_slam_tpu.mpmask.bts import BtsConfig, BtsModel, local_planar_guidance
from nalo_slam_tpu.mpmask.train import (init_sharded, make_optimizer,
                                        make_train_step, silog_loss)
from nalo_slam_tpu.mpmask.evaluate import compute_errors


def test_lpg_constant_plane():
    # fronto-parallel plane: n=(0,0,1), dist=d -> depth == d everywhere
    pe = np.zeros((1, 2, 3, 4), np.float32)
    pe[..., 2] = 1.0
    pe[..., 3] = 5.0
    d = local_planar_guidance(jnp.asarray(pe), 4)
    assert d.shape == (1, 8, 12)
    np.testing.assert_allclose(np.asarray(d), 5.0, atol=1e-5)


def test_silog_zero_for_exact():
    gt = jnp.ones((2, 8, 8)) * 3.0
    mask = jnp.ones((2, 8, 8), bool)
    assert float(silog_loss(gt, gt, mask)) < 1e-3


def test_bts_forward_shapes():
    cfg = BtsConfig.tiny()
    model = BtsModel(cfg)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    d8, d4, d2, r1, final = model.apply(variables, x, train=False)
    assert final.shape == (1, 64, 96, 1)
    assert d8.shape == (1, 64, 96, 1)
    assert float(final.min()) >= 0.0 and float(final.max()) <= 1.0


@pytest.mark.slow
def test_sharded_train_step_decreases_loss():
    cfg = BtsConfig.tiny()
    model = BtsModel(cfg)
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    B, H, W = 4, 32, 64
    params, stats = init_sharded(model, mesh, (1, H, W, 3))
    tx = make_optimizer(1e-3, 50)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    gt = jnp.asarray(1.0 + 10.0 * rng.random((B, H, W)), jnp.float32)
    with jax.sharding.set_mesh(mesh):
        losses = []
        for _ in range(8):
            params, stats, opt_state, loss = step(params, stats, opt_state, imgs, gt)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_compute_errors_reference_values():
    gt = np.full(100, 4.0)
    pred = np.full(100, 5.0)
    m = compute_errors(gt, pred)
    np.testing.assert_allclose(m["abs_rel"], 0.25)
    np.testing.assert_allclose(m["rmse"], 1.0)
    assert m["d1"] == 0.0  # 5/4 == 1.25 is not strictly < 1.25
