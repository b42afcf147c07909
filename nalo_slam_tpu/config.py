"""Runtime configuration.

One frozen-ish dataclass replaces the reference's ~100 mutable globals
(reference: src/util/settings.{h,cpp}) plus the CLI preset tables
(reference: src/main_dso_pangolin.cpp:100-181).  Defaults mirror
settings.cpp:32-251 exactly so behavior is comparable run-for-run.

Compile-time constants of the reference (PYR_LEVELS, patternNum, CPARS,
SCALE_*) live here as module constants; the padded slot sizes that make the
TPU shapes static (MAX_FRAMES, MAX_POINTS, ...) are new to this rebuild.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# Compile-time constants (reference: src/util/settings.h:52, NumType.h:41-53)
# ---------------------------------------------------------------------------

PYR_LEVELS = 6
CPARS = 4

# mutable interactive debug knob (reference settings.cpp:236-251 handleKey
# 'd'/'s'; consumed by the debug-render color mode like debugPlot's use of
# freeDebugParam5, FullSystemDebugStuff.cpp:119,187)
FREE_DEBUG_PARAM5 = 0.0  # fx fy cx cy

# Residual pattern 8 ("8 for SSE efficiency"; reference settings.cpp:297-300,
# staticPattern index 8, padding 2).  dx, dy offsets around the point.
PATTERN = np.array(
    [[0, -2], [-1, -1], [1, -1], [-2, 0], [0, 0], [2, 0], [-1, 1], [0, 2]],
    dtype=np.int32,
)
PATTERN_NUM = 8
PATTERN_PADDING = 2

# Internal parameter scalings (reference: src/FullSystem/HessianBlocks.h:61-77)
SCALE_IDEPTH = 1.0
SCALE_XI_ROT = 1.0
SCALE_XI_TRANS = 0.5
SCALE_F = 50.0
SCALE_C = 50.0
SCALE_A = 10.0
SCALE_B = 1000.0

# Solver-mode bit flags (reference: src/util/settings.h:37-48)
SOLVER_SVD = 1
SOLVER_ORTHOGONALIZE_SYSTEM = 2
SOLVER_ORTHOGONALIZE_POINTMARG = 4
SOLVER_ORTHOGONALIZE_FULL = 8
SOLVER_SVD_CUT7 = 16
SOLVER_REMOVE_POSEPRIOR = 32
SOLVER_USE_GN = 64
SOLVER_FIX_LAMBDA = 128
SOLVER_ORTHOGONALIZE_X = 256
SOLVER_MOMENTUM = 512
SOLVER_STEPMOMENTUM = 1024
SOLVER_ORTHOGONALIZE_X_LATER = 2048


@dataclass
class Settings:
    """Runtime knobs.  Defaults = reference settings.cpp:32-251."""

    # --- NALO flags (reference settings.cpp:34-42) ---
    use_lidar: bool = True          # setting_useLidar: fuse mask into selection
    dense_track: bool = True        # dense frontend tracking
    init_height: float = -1.0
    scale_fix: bool = False
    plane_optimize: bool = True     # setPlaneOptimize
    # overlapped keyframe path: adopt activation results into the point
    # store ON DEVICE and dispatch the window GN before pulling the
    # activation flat, hiding the activation pull round-trip + host adopt
    # behind the GN's device time (full_system._kf_pre_overlapped).
    # Equivalent to the sequential path by construction (rank-ordered slot
    # assignment; tests/test_overlap_act.py pins it); overlapAct=0 reverts.
    overlap_activation: bool = True
    # GN budget of the post-rescale photometric re-opt (the reference's
    # Ceres SWGrayOptimize_J runs 50 iterations with Huber(100),
    # PlaneOptimize.cpp:307-454; the window GN converges in far fewer --
    # A/B'd on the 350-frame NALO parity harness, docs/PARITY.md)
    plane_reopt_iters: int = 3
    dense_mapping: bool = False     # denseMapping
    tsdf: bool = False              # setting_tsdf

    # --- keyframe heuristics (settings.cpp:45-51) ---
    keyframes_per_second: float = 0.0
    real_time_max_kf: bool = False
    max_shift_weight_t: float = 0.04 * (640 + 480)
    max_shift_weight_r: float = 0.0 * (640 + 480)
    max_shift_weight_rt: float = 0.02 * (640 + 480)
    kf_global_weight: float = 1.0
    max_affine_weight: float = 2.0

    # --- priors (settings.cpp:56-62) ---
    idepth_fix_prior: float = 50.0 * 50.0
    idepth_fix_prior_marg_fac: float = 600.0 * 600.0
    initial_rot_prior: float = 1e11
    initial_trans_prior: float = 1e10
    initial_aff_b_prior: float = 1e14
    initial_aff_a_prior: float = 1e14
    initial_calib_hessian: float = 5e9

    # --- solver (settings.cpp:69-71) ---
    solver_mode: int = SOLVER_FIX_LAMBDA | SOLVER_ORTHOGONALIZE_X_LATER
    solver_mode_delta: float = 1e-5
    force_accept_step: bool = True

    # --- point activation / marginalization (settings.cpp:76-78) ---
    min_idepth_h_act: float = 100.0
    min_idepth_h_marg: float = 50.0

    # --- densities & window (settings.cpp:81-95) ---
    desired_immature_density: float = 1500.0
    desired_point_density: float = 2000.0
    min_points_remaining: float = 0.05
    max_log_aff_fac_in_window: float = 0.7
    min_frames: int = 5
    max_frames: int = 7
    min_frame_age: int = 1
    max_opt_iterations: int = 6
    min_opt_iterations: int = 1
    th_opt_iterations: float = 1.2

    # --- outlier thresholds (settings.cpp:102-103) ---
    outlier_th: float = 12.0 * 12.0
    outlier_th_sum_component: float = 50.0 * 50.0

    # --- marginalization weight (settings.cpp:108) ---
    marg_weight_fac: float = 0.5 * 0.5
    # GN iterations when activating a point (settings.cpp)
    gn_its_on_point_activation: int = 3

    # --- re-track / trace quality (settings.cpp:113-116, 166-174) ---
    re_track_threshold: float = 1.5
    min_trace_quality: float = 3.0
    min_trace_test_radius: int = 2
    trace_stepsize: float = 1.0
    trace_gn_iterations: int = 3
    trace_gn_threshold: float = 0.1
    trace_extra_slack_on_th: float = 1.2
    trace_slack_interval: float = 1.5
    trace_min_improvement_factor: float = 2.0

    # --- residual gating (settings.cpp:120-121) ---
    min_good_active_res_for_marg: int = 3
    min_good_res_for_marg: int = 4

    # --- photometric calibration (settings.cpp:127-139) ---
    photometric_calibration: int = 2   # 0 nothing, 1 inv response, 2 +vignette
    use_exposure: bool = True
    affine_opt_mode_a: float = 1e12    # <0 fix, >=0 optimize (prior if >0)
    affine_opt_mode_b: float = 1e8
    gamma_weights_pixel_select: int = 1

    # --- robust cost (settings.cpp:136) ---
    huber_th: float = 9.0

    # --- frame energy threshold (settings.cpp:143-147) ---
    frame_energy_th_const_weight: float = 0.5
    frame_energy_th_n: float = 0.7
    frame_energy_th_fac_median: float = 1.5
    overall_energy_th_weight: float = 1.0
    coarse_cutoff_th: float = 20.0

    # --- pixel selection (settings.cpp, PixelSelector2) ---
    min_grad_hist_cut: float = 0.5
    min_grad_hist_add: float = 7.0
    grad_downweight_per_level: float = 0.75
    select_direction_distribution: bool = True

    # --- immature tracing bounds ---
    max_pix_search: float = 0.027      # fraction of (w+h)
    # (the reference's setting_maxIdepth is declared but never read
    #  anywhere in its sources; no equivalent knob is kept here)

    # --- benchmark noise injection (settings.cpp:183-186,
    #     Undistort.cpp:452-484) ---
    benchmark_var_noise: float = 0.0       # px-shift noise amplitude
    benchmark_noise_grid_size: int = 3
    benchmark_var_blur_noise: float = 0.0  # spatially-varying blur (applyBlurNoise)
    # benchmark resize hooks (settings.cpp:180-182, Undistort.cpp:892-917)
    benchmark_width: int = 0               # override output width
    benchmark_height: int = 0              # override output height
    benchmark_fxfyfac: float = 0.0         # lower bound on output fx/fy

    # --- playback / misc ---
    debugout_runquiet: bool = True
    log_stuff: bool = False
    benchmark_initializer_slack_factor: float = 1.0

    # -----------------------------------------------------------------
    # Rebuild-only: static padded shapes for XLA.  These are ceilings,
    # not targets; validity masks do the rest.
    # -----------------------------------------------------------------
    max_window_frames: int = 8         # >= max_frames + 1 (insert before marg)
    max_points: int = 8192             # active PointHessian slots (window total)
    max_immature_per_frame: int = 2048
    pyr_levels: int = PYR_LEVELS

    # run the whole GN loop as one device program (device_opt.py); the
    # float64 host path remains for validation
    use_device_opt: bool = True

    # random seed mirroring the reference's srand(3141592)
    seed: int = 3141592

    def replace(self, **kw) -> "Settings":
        return dataclasses.replace(self, **kw)


def preset(num: int, base: Settings | None = None) -> Settings:
    """CLI presets (reference: src/main_dso_pangolin.cpp:100-181).

    0/1: default sparse DSO operating point (2000 pts, 5-7 KF).
    2/3: FAST: 800 points, 4-6 KFs, <=4 iterations, reduced resolution.
    5:   NALO default densities (5000 / 4000).
    """
    s = base or Settings()
    if num in (0, 1):
        # NALO's default operating point (main_dso_pangolin.cpp:104-122):
        # unlike upstream DSO, presets 0/1 use the 5000/4000 densities.
        return s.replace(
            desired_point_density=5000.0,
            desired_immature_density=4000.0,
            max_points=16384,
            max_immature_per_frame=4096,
            min_frames=5,
            max_frames=7,
            max_opt_iterations=6,
            min_opt_iterations=1,
        )
    if num in (2, 3):
        # FAST: 800 pts, 4-6 KFs, <=4 iters, 424x320 (:126-146)
        return s.replace(
            desired_point_density=800.0,
            desired_immature_density=600.0,
            min_frames=4,
            max_frames=6,
            max_opt_iterations=4,
            min_opt_iterations=1,
            benchmark_width=424,
            benchmark_height=320,
        )
    if num == 4:
        # DSO-style sparse point (:159-167): mask fusion off, stock densities
        return s.replace(
            use_lidar=False,
            desired_point_density=2000.0,
            desired_immature_density=1500.0,
            min_frames=5,
            max_frames=7,
            max_opt_iterations=6,
            min_opt_iterations=1,
        )
    if num == 5:
        return s.replace(
            desired_point_density=5000.0,
            desired_immature_density=4000.0,
            max_points=16384,
            max_immature_per_frame=4096,
            min_frames=5,
            max_frames=7,
            max_opt_iterations=6,
            min_opt_iterations=1,
        )
    return s


def parse_kv_args(argv: list[str], base: Settings | None = None) -> tuple[Settings, dict]:
    """Parse the reference's `key=value` CLI style
    (reference: src/main_dso_pangolin.cpp:183-448).

    Returns (settings, extras) where extras holds non-Settings keys such as
    files=, calib=, gamma=, vignette=, masks=, colors=, start=, end=, mode=.
    """
    s = base or Settings()
    extras: dict = {}
    for arg in argv:
        if "=" not in arg:
            extras[arg] = True
            continue
        k, v = arg.split("=", 1)
        if k == "preset":
            s = preset(int(v), s)
            extras["preset"] = v  # playback-speed defaults live in the CLI
        elif k == "dense":
            s = s.replace(dense_track=bool(int(v)))
        elif k == "planeOpt":
            # scale_fix is RUNTIME state (locks when the ground height
            # stabilizes); planeOpt only enables the pipeline
            s = s.replace(plane_optimize=bool(int(v)))
        elif k == "planeReoptIters":
            s = s.replace(plane_reopt_iters=int(v))
        elif k == "overlapAct":
            s = s.replace(overlap_activation=bool(int(v)))
        elif k == "deviceOpt":
            # 0 routes the window BA through the f64 host oracle
            # (energy.optimize) -- a solver-path A/B for divergence hunts
            s = s.replace(use_device_opt=bool(int(v)))
        elif k == "densemap":
            s = s.replace(dense_mapping=bool(int(v)))
        elif k == "tsdf":
            s = s.replace(tsdf=bool(int(v)))
        elif k == "lidar":
            s = s.replace(use_lidar=bool(int(v)))
        elif k == "mode":
            # 0: full photometric calib; 1: no calib files; 2: synthetic
            mode = int(v)
            extras["mode"] = mode
            if mode == 1:
                s = s.replace(photometric_calibration=0, use_exposure=False,
                              affine_opt_mode_a=0.0, affine_opt_mode_b=0.0)
            elif mode == 2:
                s = s.replace(photometric_calibration=0, use_exposure=False,
                              affine_opt_mode_a=-1.0, affine_opt_mode_b=-1.0)
        elif k == "quiet":
            s = s.replace(debugout_runquiet=bool(int(v)))
        elif k == "logStuff":   # 9-stream logging gate (settings.cpp:203)
            s = s.replace(log_stuff=bool(int(v)))
        elif k == "width":      # benchmark resize hooks (:419-445)
            s = s.replace(benchmark_width=int(v))
        elif k == "height":
            s = s.replace(benchmark_height=int(v))
        elif k == "fxfyfac":
            s = s.replace(benchmark_fxfyfac=float(v))
        elif k == "noise":      # geometric noise amplitude (px)
            s = s.replace(benchmark_var_noise=float(v))
        elif k.startswith("set_") and hasattr(s, k[4:]):
            # generic Settings override (set_<field>=<value>) for experiments
            field = k[4:]
            cur = getattr(s, field)
            if isinstance(cur, bool):
                val = bool(int(v))
            elif isinstance(cur, int):
                val = int(float(v))
            elif isinstance(cur, float):
                val = float(v)
            else:
                val = v
            s = s.replace(**{field: val})
        else:
            extras[k] = v
    return s, extras
