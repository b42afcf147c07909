"""Runtime checkpoint / resume.

The reference has NO runtime checkpointing (state lives in RAM; SURVEY.md
§5) -- the rebuild serializes the sliding-window state (frames, points,
marginalization prior HM/bM, FEJ Jacobian store, immature points, ground/
plane state and the trajectory) so a run can resume mid-sequence.  The
mask-net uses orbax separately (mpmask/infer.py).
"""

from __future__ import annotations

import numpy as np

from ..geometry import SE3


def save_checkpoint(path: str, system) -> None:
    w = system.window
    if hasattr(w, "sync_r_energy"):
        w.sync_r_energy()
    p = w.pts
    arrays = {}
    # points + residual slots
    for name in ("active", "host", "u", "v", "color", "weights", "idepth",
                 "idepth_zero", "energy_th", "prior", "has_depth_prior",
                 "num_good_res", "idepth_hessian", "my_type", "status",
                 "r_exists", "r_state", "r_active", "r_linearized", "r_energy"):
        arrays[f"pts_{name}"] = getattr(p, name)
    # jstore (FEJ Jacobians)
    for k, v in w.jstore.items():
        arrays[f"jstore_{k}"] = np.asarray(v)
    # frames
    nf = w.n_frames
    arrays["n_frames"] = np.array(nf)
    arrays["frame_state"] = np.stack([f.state for f in w.frames]) if nf else np.zeros((0, 10))
    arrays["frame_zero"] = np.stack([f.state_zero for f in w.frames]) if nf else np.zeros((0, 10))
    arrays["frame_evalR"] = np.stack([f.worldToCam_evalPT.R for f in w.frames]) if nf else np.zeros((0, 3, 3))
    arrays["frame_evalt"] = np.stack([f.worldToCam_evalPT.t for f in w.frames]) if nf else np.zeros((0, 3))
    arrays["frame_exposure"] = np.array([f.ab_exposure for f in w.frames])
    arrays["frame_eth"] = np.array([f.frame_energy_th for f in w.frames])
    arrays["frame_id"] = np.array([f.frame_id for f in w.frames])
    arrays["frame_shell_id"] = np.array(
        [f.shell.id if f.shell else -1 for f in w.frames]
    )
    # marginalization prior + calib
    arrays["HM"] = w.HM
    arrays["bM"] = w.bM
    arrays["calib_value"] = w.calib_value
    arrays["calib_zero"] = w.calib_zero
    # images (device) -- needed to continue BA
    arrays["images"] = np.asarray(w.images)
    # trajectory
    rows = system.trajectory()
    arrays["trajectory"] = np.array(rows) if rows else np.zeros((0, 8))
    # misc scalars
    arrays["meta"] = np.array([
        system.current_min_act_dist, system.first_coarse_rmse,
        float(system.initialized), float(system.ground_state.scale_fix),
        system.ground_state.init_height, float(system.global_plane.fixed),
        system.global_plane.lgh,
    ])
    arrays["gplane"] = system.global_plane.gplane
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, system) -> None:
    """Restores window + plane state into a freshly constructed FullSystem
    (same settings/calib).  Shells beyond the window are restored as
    trajectory rows only."""
    import jax.numpy as jnp

    from ..backend.window import FrameState

    data = np.load(path, allow_pickle=False)
    w = system.window
    p = w.pts
    for name in ("active", "host", "u", "v", "color", "weights", "idepth",
                 "idepth_zero", "energy_th", "prior", "has_depth_prior",
                 "num_good_res", "idepth_hessian", "my_type", "status",
                 "r_exists", "r_state", "r_active", "r_linearized", "r_energy"):
        setattr(p, name, data[f"pts_{name}"].copy())
    w.jstore = {k: jnp.asarray(data[f"jstore_{k}"])
                for k in list(w.jstore.keys())}
    nf = int(data["n_frames"])
    w.frames = []
    from .full_system import FrameShell, ImmatureStore

    system.immatures = []
    system.kf_masks, system.kf_images, system.kf_bgr = [], [], []
    for i in range(nf):
        shell = FrameShell(int(data["frame_shell_id"][i]), -1, 0.0)
        fs = FrameState(int(data["frame_id"][i]), shell,
                        float(data["frame_exposure"][i]), system.s)
        fs.worldToCam_evalPT = SE3(data["frame_evalR"][i], data["frame_evalt"][i])
        fs.set_state(data["frame_state"][i])
        fs.state_zero = data["frame_zero"][i].copy()
        fs.frame_energy_th = float(data["frame_eth"][i])
        fs.haveground = False
        fs.groundP = np.zeros(4)
        shell.camToWorld = fs.PRE_camToWorld
        w.frames.append(fs)
        system.immatures.append(ImmatureStore(system.s.max_immature_per_frame))
        system.kf_masks.append(None)
        system.kf_images.append(None)
        system.kf_bgr.append(None)
        system.all_kf_shells.append(shell)
    w.HM = data["HM"].copy()
    w.bM = data["bM"].copy()
    w.calib_value = data["calib_value"].copy()
    w.calib_zero = data["calib_zero"].copy()
    w.images = jnp.asarray(data["images"])
    w.set_adjoints()
    meta = data["meta"]
    system.current_min_act_dist = float(meta[0])
    system.first_coarse_rmse = float(meta[1])
    system.initialized = bool(meta[2])
    system.ground_state.scale_fix = bool(meta[3])
    system.ground_state.init_height = float(meta[4])
    system.global_plane.fixed = bool(meta[5])
    system.global_plane.lgh = float(meta[6])
    system.global_plane.gplane = data["gplane"].copy()
