"""flagFramesForMarginalization decision rule (FullSystemMarginalize.cpp:58-147).

Pins the reference's point-fraction rule `in < setting_minPointsRemaining *
(in+out)` — including a case where it disagrees with a naive absolute
threshold — plus the brightness-gap rule, the min_frames guard, and the
distance-score selection."""

import numpy as np

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.system.full_system import compute_marg_flags


def mk(n, spread=1.0):
    # symmetric distance matrix: frames laid out on a line
    xs = np.arange(n) * spread
    return np.abs(xs[:, None] - xs[None, :]) + np.eye(n) * 0.0


def settings():
    s = Settings()
    s.min_frames = 5
    s.max_frames = 7
    s.min_frame_age = 1
    return s


def test_fraction_rule_disagrees_with_absolute_threshold():
    s = settings()
    n = 7
    in_pts = [100] * n
    out_pts = [0] * n
    # frame 2: 20 live points left of a lifetime 520 -> 20 < 0.05*520 = 26
    # (an absolute `in < 8` test would NOT flag this frame)
    in_pts[2] = 20
    out_pts[2] = 500
    flags = compute_marg_flags(in_pts, out_pts, [0.0] * n, list(range(10, 10 + n)),
                               mk(n), s)
    assert flags[2]
    assert sum(flags[:3]) + sum(flags[4:]) >= 1  # frame 2 flagged


def test_fraction_rule_keeps_healthy_frame():
    s = settings()
    n = 6  # below max_frames: distance rule must not fire
    in_pts = [30] * n
    out_pts = [500] * n  # 30 >= 0.05*530 = 26.5 -> keep all
    flags = compute_marg_flags(in_pts, out_pts, [0.0] * n, list(range(10, 10 + n)),
                               mk(n), s)
    assert not any(flags)


def test_brightness_gap_rule():
    s = settings()
    n = 6
    log_rel_a = [0.0] * n
    log_rel_a[1] = 0.9  # > setting_maxLogAffFacInWindow = 0.7
    flags = compute_marg_flags([100] * n, [0] * n, log_rel_a,
                               list(range(10, 10 + n)), mk(n), s)
    assert flags[1] and sum(flags) == 1


def test_min_frames_guard_limits_flagging():
    s = settings()
    n = 6
    # every frame looks starved, but only n - min_frames = 1 may be flagged
    flags = compute_marg_flags([1] * n, [500] * n, [0.0] * n,
                               list(range(10, 10 + n)), mk(n), s)
    assert sum(flags) == n - s.min_frames


def test_distance_score_picks_closest_cluster_frame():
    s = settings()
    n = 7  # full window, healthy points -> rule 2 fires
    # frames 1 and 2 nearly coincident -> huge 1/dist terms -> one of them goes
    xs = np.array([0.0, 1.0, 1.001, 2.0, 3.0, 4.0, 5.0])
    dists = np.abs(xs[:, None] - xs[None, :])
    flags = compute_marg_flags([100] * n, [0] * n, [0.0] * n,
                               list(range(10, 10 + n)), dists, s)
    assert sum(flags) == 1
    assert flags[1] or flags[2]


def test_distance_score_skips_first_and_new_frames():
    s = settings()
    n = 7
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 5.001])
    dists = np.abs(xs[:, None] - xs[None, :])
    # frame 6 is the latest, frame 5 nearly coincident with it; but candidates
    # must satisfy frame_id <= latest - min_frame_age, so 6 itself is skipped;
    # frame id 0 (index 0 here) is never marginalized by rule 2
    flags = compute_marg_flags([100] * n, [0] * n, [0.0] * n,
                               [0, 11, 12, 13, 14, 15, 16], dists, s)
    assert sum(flags) == 1
    assert flags[5]
    assert not flags[0] and not flags[6]
