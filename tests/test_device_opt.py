"""Parity of the one-call device GN loop vs the float64 host path."""

import numpy as np
import pytest

# kernel-parity suite: meaningful on real TPU via -m axon (see conftest)
pytestmark = pytest.mark.axon

from nalo_slam_tpu.geometry import SE3
from test_ba import build_window


def test_device_matches_host_optimize():
    opt_h, gt, idepths, slots = build_window(n_frames=3, pose_perturb=4e-3,
                                             idepth_perturb=0.02)
    opt_d, _, _, _ = build_window(n_frames=3, pose_perturb=4e-3,
                                  idepth_perturb=0.02)
    rmse_h = opt_h.optimize(6)
    rmse_d = opt_d.optimize_device(6)
    assert np.isfinite(rmse_d)
    assert abs(rmse_h - rmse_d) < 0.3, (rmse_h, rmse_d)
    for k in range(3):
        ph = opt_h.frames[k].PRE_worldToCam
        pd = opt_d.frames[k].PRE_worldToCam
        err = (ph.inverse() * pd).log()
        assert np.linalg.norm(err) < 2e-3, f"frame {k}: {err}"
    mh = opt_h.pts.active
    md = opt_d.pts.active
    assert (mh == md).all()
    rel = np.abs(opt_h.pts.idepth[mh] - opt_d.pts.idepth[mh]) / np.maximum(
        opt_h.pts.idepth[mh], 1e-3
    )
    assert np.median(rel) < 0.01, np.median(rel)
    # residual bookkeeping in sync
    assert (opt_h.pts.r_linearized == opt_d.pts.r_linearized).mean() > 0.95
    assert (opt_h.pts.r_state == opt_d.pts.r_state).mean() > 0.95


def test_device_then_marginalize():
    opt, gt, _, slots = build_window(n_frames=3, pose_perturb=3e-3)
    opt.optimize_device(6)
    host0 = opt.pts.active & (opt.pts.host == 0)
    opt.marginalize_points(host0)
    opt.marginalize_frame(0)
    assert opt.n_frames == 2
    r = opt.optimize_device(3)
    assert np.isfinite(r)
