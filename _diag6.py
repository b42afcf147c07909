import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/nalo_jax_cache")
from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.geometry import SE3, PyramidCalib
from nalo_slam_tpu.system import FullSystem
from nalo_slam_tpu.utils.synthetic import PlaneScene
w, hh = 320, 240
calib = PyramidCalib.make(w, hh, 260.0, 260.0, (w - 1) / 2, (hh - 1) / 2)
scene = PlaneScene(calib, z0=4.0)
s = Settings(max_window_frames=8, max_points=2048, max_immature_per_frame=1024,
             desired_point_density=800.0, desired_immature_density=600.0,
             use_lidar=False, dense_track=False, plane_optimize=False)
rng = np.random.default_rng(7)
frames = []
for k in range(60):
    xi = np.array([0.05*k, 0.008*np.sin(0.2*k), 0.01*k, 0.0, 0.002*np.sin(0.11*k), 0.0])
    img, _ = scene.render(SE3.exp(xi))
    frames.append(img + rng.normal(scale=1.5, size=img.shape).astype(np.float32))
sys_ = FullSystem(s, calib)
kfb = 0
times=[]
for k, img in enumerate(frames):
    t0 = time.perf_counter()
    sys_.add_frame(img, 1.0, float(k), k)
    dt = time.perf_counter()-t0
    times.append(dt)
    kf = sys_.statistics['n_keyframes']
    print(f"{k:3d} {'KF' if kf!=kfb else '  '} {dt:6.2f} res={sys_.last_coarse_rmse[0]:.3f}", flush=True)
    kfb = kf
print("median20+:", np.median(times[20:]))
