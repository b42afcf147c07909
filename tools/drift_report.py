"""Drift forensics: diff a parity run pair (ours vs reference) frame by frame.

Feeds VERDICT r4 tasks 2/4 (NALO affine-drift divergence, sparse drift gap):
instead of one end-of-run ATE number, localize WHERE the trajectories part
and what the estimators were doing at that moment:

  * per-frame affine (a,b) estimates: ours from the `coarse_tracking`
    metrics stream (logStuff=1), the reference's from its stdout
    "Coarse Tracker tracked ab = <a> <b> (exp ...). Res <r>!" lines
    (reference CoarseTracker printout, FullSystem.cpp:621-631);
  * per-frame position gap after Sim(3) alignment of the common
    trajectory (so a scale blow-up shows as a ramp, a tracking loss as
    a step);
  * ours-only ground/plane event timeline (`ground`, `plane_lock`,
    `plane_opt` streams) -- the reference never engaged its scale-fix
    machinery on the synthetic parity sequences (no "ground height fix"
    in its logs), so any rescale we apply is by itself a divergence.

Usage:
  python tools/drift_report.py ours_metrics=<metrics.jsonl> \
      ours=<ours.txt> ref=<ref.txt> ref_log=<ref_stdout.log> \
      [gt=<gt.txt>] [top=15]
"""

from __future__ import annotations

import json
import re
import sys

import numpy as np


def kv_args(argv):
    out = {}
    for a in argv:
        k, _, v = a.partition("=")
        out[k] = v
    return out


def load_tum(path):
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    return rows[:, 0], rows[:, 1:4]


def sim3_align(src, dst):
    """Umeyama: returns (s, R, t) minimizing ||s R src + t - dst||."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (xs ** 2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / var if var > 0 else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def associate(t_a, t_b, max_dt=0.05):
    ia, ib = [], []
    j = 0
    for i, ta in enumerate(t_a):
        while j + 1 < len(t_b) and abs(t_b[j + 1] - ta) <= abs(t_b[j] - ta):
            j += 1
        if abs(t_b[j] - ta) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.array(ia), np.array(ib)


REF_AB = re.compile(
    r"Coarse Tracker tracked ab = (-?[\d.e+-]+) (-?[\d.e+-]+) "
    r"\(exp ([\d.e+-]+)\)\. Res ([\d.e+-]+|nan|inf)!")


def parse_ref_ab(path):
    out = []
    for line in open(path, errors="replace"):
        m = REF_AB.search(line)
        if m:
            out.append((float(m.group(1)), float(m.group(2))))
    return np.array(out) if out else np.zeros((0, 2))


def parse_ours_streams(path):
    ab, ground, plane = [], [], []
    for line in open(path):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = d.get("event")
        if ev == "coarse_tracking":
            ab.append((d["a"], d["b"]))
        elif ev == "ground":
            ground.append(d)
        elif ev in ("plane_lock", "plane_opt"):
            plane.append(d)
    return np.array(ab) if ab else np.zeros((0, 2)), ground, plane


def main():
    args = kv_args(sys.argv[1:])
    top = int(args.get("top", "15"))

    t_o, p_o = load_tum(args["ours"])
    t_r, p_r = load_tum(args["ref"])
    io_, ir_ = associate(t_o, t_r)
    s, R, t = sim3_align(p_o[io_], p_r[ir_])
    gap = np.linalg.norm((s * (R @ p_o[io_].T).T + t) - p_r[ir_], axis=1)
    print(f"# trajectory gap (ours->ref Sim3-aligned, {len(gap)} pairs, "
          f"scale {s:.4f})")
    print(f"rmse={np.sqrt((gap**2).mean()):.4f} max={gap.max():.4f} "
          f"argmax_frame_ts={t_o[io_[gap.argmax()]]:.3f}")
    # first sustained divergence: 5 consecutive frames beyond 3x the
    # 10th-percentile gap (the aligned noise floor)
    floor = max(np.percentile(gap, 10), 1e-4)
    bad = gap > 3 * floor
    run = 0
    first = None
    for i, b in enumerate(bad):
        run = run + 1 if b else 0
        if run >= 5:
            first = i - 4
            break
    if first is not None:
        print(f"first sustained divergence: pair {first} ts "
              f"{t_o[io_[first]]:.3f} gap {gap[first]:.4f} "
              f"(floor {floor:.4f})")
    print("# worst-gap frames")
    order = np.argsort(gap)[::-1][:top]
    for i in sorted(order):
        print(f"  ts={t_o[io_[i]]:8.3f} gap={gap[i]:.4f}")

    if "ours_metrics" in args:
        ab_o, ground, plane = parse_ours_streams(args["ours_metrics"])
        ab_r = (parse_ref_ab(args["ref_log"])
                if "ref_log" in args else np.zeros((0, 2)))
        n = min(len(ab_o), len(ab_r))
        if n:
            da = np.abs(ab_o[:n, 0] - ab_r[:n, 0])
            db = np.abs(ab_o[:n, 1] - ab_r[:n, 1])
            print(f"# affine estimates vs reference ({n} tracked frames)")
            print(f"|da| mean={da.mean():.4f} max={da.max():.4f} "
                  f"argmax={da.argmax()}")
            print(f"|db| mean={db.mean():.4f} max={db.max():.4f} "
                  f"argmax={db.argmax()}")
        elif len(ab_o):
            print(f"# ours affine range: a [{ab_o[:,0].min():.4f}, "
                  f"{ab_o[:,0].max():.4f}] b [{ab_o[:,1].min():.4f}, "
                  f"{ab_o[:,1].max():.4f}] ({len(ab_o)} frames; "
                  "no ref_log lines parsed)")
        print(f"# ground events: {len(ground)}; plane events: {len(plane)}")
        n_have = sum(1 for g in ground if g.get("have_ground"))
        n_fix = sum(1 for g in ground if g.get("scale_fix"))
        print(f"  have_ground={n_have} scale_fix_frames={n_fix}")
        for g in ground[:top]:
            print(f"  kf={g['kf']} h={g['height']} have={g['have_ground']} "
                  f"fix={g['scale_fix']} rate={g.get('rate')}")
        for e in plane:
            print(f"  PLANE {e}")


if __name__ == "__main__":
    main()
