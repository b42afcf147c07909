"""Unit tests for the faithful isOOB / flagPointsForRemoval rules
(reference src/FullSystem/HessianBlocks.h:484-507 and
src/FullSystem/FullSystem.cpp:937-1030) on constructed cases."""

import numpy as np

from nalo_slam_tpu.backend.window import (PointArrays, RES_IN, RES_OOB,
                                          RES_OUTLIER, RES_NONE)
from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.system.full_system import FullSystem


class _Frame:
    def __init__(self, flagged=False):
        self.flagged_for_marg = flagged


class _Window:
    def __init__(self, pts, frames):
        self.pts = pts
        self.frames = frames
        self.F = pts.F
        self.n_frames = len(frames)


def _make(n_frames=5, flagged=(), P=16):
    s = Settings()
    pts = PointArrays(P, 8, s)
    frames = [_Frame(i in flagged) for i in range(n_frames)]
    stub = FullSystem.__new__(FullSystem)
    stub.s = s
    stub.window = _Window(pts, frames)
    return stub, pts, s


def _add_point(p, slot, host=0, n_res=4, idepth=0.5, hess=1e3, ngood=20,
               last0=RES_IN, last1=RES_IN):
    p.active[slot] = True
    p.host[slot] = host
    p.idepth[slot] = idepth
    p.idepth_hessian[slot] = hess
    p.num_good_res[slot] = ngood
    p.last_res_state[slot] = (last0, last1)
    p.r_exists[slot, :n_res] = True
    p.r_state[slot, :n_res] = RES_IN


def test_healthy_point_survives():
    stub, p, s = _make()
    _add_point(p, 0)
    stub._flag_points_for_removal()
    assert p.status[0] == 0 and p.active[0]


def test_negative_idepth_dropped():
    stub, p, s = _make()
    _add_point(p, 0, idepth=-0.1)
    stub._flag_points_for_removal()
    assert p.status[0] == 2 and not p.active[0]


def test_no_residuals_dropped():
    stub, p, s = _make()
    _add_point(p, 0, n_res=0)
    stub._flag_points_for_removal()
    assert p.status[0] == 2 and not p.active[0]


def test_rule2_last_residual_oob_marginalized():
    stub, p, s = _make()
    _add_point(p, 0, last0=RES_OOB)
    stub._flag_points_for_removal()
    assert p.status[0] == 1  # inlier -> marginalize


def test_rule2_last_residual_oob_low_hessian_dropped():
    stub, p, s = _make()
    _add_point(p, 0, last0=RES_OOB, hess=s.min_idepth_h_marg / 2)
    stub._flag_points_for_removal()
    assert p.status[0] == 2 and not p.active[0]


def test_rule3_double_outlier():
    stub, p, s = _make()
    _add_point(p, 0, last0=RES_OUTLIER, last1=RES_OUTLIER)
    stub._flag_points_for_removal()
    assert p.status[0] == 1
    # single outlier towards the newest frame is NOT enough
    stub2, p2, _ = _make()
    _add_point(p2, 0, last0=RES_OUTLIER, last1=RES_IN)
    stub2._flag_points_for_removal()
    assert p2.status[0] == 0


def test_rule3_needs_two_residuals():
    stub, p, s = _make()
    _add_point(p, 0, n_res=1, last0=RES_OUTLIER, last1=RES_OUTLIER)
    stub._flag_points_for_removal()
    assert p.status[0] == 0  # residuals.size() < 2 -> not OOB


def test_rule1_visibility_in_marg_frames():
    # 4 residuals, 2 of them IN and targeting flagged frames:
    # 4 - 2 = 2 < minGoodActiveResForMarg(3) -> OOB, well-observed -> marg
    stub, p, s = _make(flagged=(1, 2))
    _add_point(p, 0, n_res=4, ngood=s.min_good_res_for_marg + 11)
    stub._flag_points_for_removal()
    assert p.status[0] == 1
    # same point but barely-observed (ngood <= min+10): rule 1 does not fire
    stub2, p2, _ = _make(flagged=(1, 2))
    _add_point(p2, 0, n_res=4, ngood=s.min_good_res_for_marg + 10)
    stub2._flag_points_for_removal()
    assert p2.status[0] == 0


def test_rule1_not_fired_when_enough_remain():
    # 5 residuals, only 1 sees a flagged frame: 5 - 1 = 4 >= 3 -> keep
    stub, p, s = _make(flagged=(1,))
    _add_point(p, 0, n_res=5, ngood=s.min_good_res_for_marg + 11)
    stub._flag_points_for_removal()
    assert p.status[0] == 0


def test_host_flagged_marginalizes():
    stub, p, s = _make(flagged=(0,))
    _add_point(p, 0, host=0)
    stub._flag_points_for_removal()
    assert p.status[0] == 1


def test_host_flagged_not_inlier_dropped():
    stub, p, s = _make(flagged=(0,))
    _add_point(p, 0, host=0, ngood=s.min_good_res_for_marg - 1)
    stub._flag_points_for_removal()
    assert p.status[0] == 2 and not p.active[0]
