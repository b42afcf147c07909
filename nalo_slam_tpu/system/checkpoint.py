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
    if hasattr(system, "sync_immature_host"):
        system.sync_immature_host()
    p = w.pts
    arrays = {}
    # points + residual slots
    for name in ("active", "host", "u", "v", "color", "weights", "idepth",
                 "idepth_zero", "energy_th", "prior", "has_depth_prior",
                 "num_good_res", "idepth_hessian", "my_type", "status",
                 "last_res_state", "r_exists", "r_state", "r_active",
                 "r_linearized", "r_energy", "r_is_new"):
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
    # full shell history (pre-window poses included), so the final TUM
    # trajectory is complete after resume
    shells = system.all_shells
    ns = len(shells)
    arrays["shell_ts"] = np.array([sh.timestamp for sh in shells])
    arrays["shell_incoming"] = np.array([sh.incoming_id for sh in shells])
    arrays["shell_valid"] = np.array([sh.poseValid for sh in shells])
    arrays["shell_marg_at"] = np.array([sh.marginalizedAt for sh in shells])
    arrays["shell_aff"] = (np.array([sh.aff_g2l for sh in shells])
                           if ns else np.zeros((0, 2)))
    arrays["shell_q"] = (np.stack([sh.camToWorld.quaternion_xyzw() for sh in shells])
                         if ns else np.zeros((0, 4)))
    arrays["shell_t"] = (np.stack([sh.camToWorld.t for sh in shells])
                         if ns else np.zeros((0, 3)))
    # immature host stores of the window frames
    for f in ("valid", "u", "v", "color", "weights", "gradH", "idepth_min",
              "idepth_max", "quality", "status", "pixel_interval", "my_type",
              "energy_th"):
        arrays[f"imm_{f}"] = (np.stack([getattr(st, f) for st in system.immatures])
                              if system.immatures else np.zeros((0,)))
    arrays["last_coarse_rmse"] = np.asarray(system.last_coarse_rmse)
    # misc scalars
    arrays["meta"] = np.array([
        system.current_min_act_dist, system.first_coarse_rmse,
        float(system.initialized), float(system.ground_state.scale_fix),
        system.ground_state.init_height, float(system.global_plane.fixed),
        system.global_plane.lgh,
    ])
    arrays["stats"] = np.array([
        system.statistics["n_keyframes"], system.statistics["n_frames"],
        system.statistics["n_points_activated"],
    ])
    arrays["gplane"] = system.global_plane.gplane
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, system) -> None:
    """Restores the FULL runtime state into a freshly constructed
    FullSystem (same settings/calib): window, points, FEJ store, shell
    history (complete TUM trajectory), immature points (host + device),
    pyramids and the coarse-tracking reference — tracking continues
    immediately after resume."""
    import jax.numpy as jnp

    from ..backend.window import FrameState

    data = np.load(path, allow_pickle=False)
    w = system.window
    p = w.pts
    for name in ("active", "host", "u", "v", "color", "weights", "idepth",
                 "idepth_zero", "energy_th", "prior", "has_depth_prior",
                 "num_good_res", "idepth_hessian", "my_type", "status",
                 "last_res_state", "r_exists", "r_state", "r_active",
                 "r_linearized", "r_energy", "r_is_new"):
        if f"pts_{name}" in data:
            setattr(p, name, data[f"pts_{name}"].copy())
    w.jstore = {k: jnp.asarray(data[f"jstore_{k}"])
                for k in list(w.jstore.keys())}

    from .full_system import FrameShell, ImmatureStore

    # full shell history
    system.all_shells = []
    for i in range(len(data["shell_ts"])):
        shell = FrameShell(i, int(data["shell_incoming"][i]),
                           float(data["shell_ts"][i]))
        q = data["shell_q"][i]
        shell.camToWorld = SE3.rot_xyzw(*q, t=data["shell_t"][i])
        shell.aff_g2l = tuple(data["shell_aff"][i])
        shell.poseValid = bool(data["shell_valid"][i])
        shell.marginalizedAt = int(data["shell_marg_at"][i])
        system.all_shells.append(shell)

    nf = int(data["n_frames"])
    w.frames = []
    system.immatures = []
    system.kf_masks, system.kf_images, system.kf_bgr = [], [], []
    M = system.s.max_immature_per_frame
    for i in range(nf):
        sid = int(data["frame_shell_id"][i])
        shell = (system.all_shells[sid] if 0 <= sid < len(system.all_shells)
                 else FrameShell(sid, -1, 0.0))
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
        st = ImmatureStore(M)
        for f in ("valid", "u", "v", "color", "weights", "gradH", "idepth_min",
                  "idepth_max", "quality", "status", "pixel_interval",
                  "my_type", "energy_th"):
            getattr(st, f)[:] = data[f"imm_{f}"][i]
        system.immatures.append(st)
        system.kf_masks.append(None)
        system.kf_images.append(None)   # refilled by rebuild_after_resume
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
    system.last_coarse_rmse = data["last_coarse_rmse"].copy()
    st = data["stats"]
    system.statistics.update(n_keyframes=int(st[0]), n_frames=int(st[1]),
                             n_points_activated=int(st[2]))

    # device-resident immature state from the restored host stores
    F = w.F
    tmpl = ImmatureStore(M)

    def flat(field):
        blocks = [getattr(s, field) for s in system.immatures]
        blocks += [getattr(tmpl, field)] * (F - nf)
        return jnp.asarray(np.concatenate(blocks, axis=0))

    system.imm_static = dict(
        u=flat("u"), v=flat("v"), color=flat("color"),
        weights=flat("weights"), gradH=flat("gradH"),
        energy_th=flat("energy_th"), my_type=flat("my_type"),
        valid=flat("valid"),
    )
    system.imm_trace = dict(
        idepth_min=flat("idepth_min"), idepth_max=flat("idepth_max"),
        quality=flat("quality"), status=flat("status"),
        interval=flat("pixel_interval"),
    )

    # pyramids, host images and the coarse-tracking reference
    system.rebuild_after_resume()
