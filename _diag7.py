import time, numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/nalo_jax_cache")
from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.geometry import SE3, PyramidCalib
from nalo_slam_tpu.system import FullSystem
from nalo_slam_tpu.utils.synthetic import PlaneScene
import nalo_slam_tpu.system.full_system as fsm

# time every private phase via wrappers
phases = {}
def wrap(name, fn):
    def inner(self, *a, **k):
        t0=time.perf_counter(); r = fn(self, *a, **k)
        phases[name] = phases.get(name, 0.) + time.perf_counter()-t0
        return r
    return inner
for name in ("_trace_new_coarse","_flag_frames_for_marginalization","_activate_points",
             "_remove_outliers","_set_tracker_ref","_flag_points_for_removal",
             "_make_new_traces","_marginalize_frame","_push_imm_valid"):
    setattr(FullSystem, name, wrap(name, getattr(FullSystem, name)))
import nalo_slam_tpu.backend.energy as en
en.WindowOptimizer.optimize_device = wrap("optimize_device", en.WindowOptimizer.optimize_device)
en.WindowOptimizer.marginalize_points = wrap("marginalize_points", en.WindowOptimizer.marginalize_points)
en.WindowOptimizer.nullspaces = wrap("nullspaces", en.WindowOptimizer.nullspaces)

w,hh=320,240
calib = PyramidCalib.make(w,hh,260.,260.,(w-1)/2,(hh-1)/2)
scene = PlaneScene(calib, z0=4.0)
s = Settings(max_window_frames=8, max_points=2048, max_immature_per_frame=1024,
             desired_point_density=800., desired_immature_density=600.,
             use_lidar=False, dense_track=False, plane_optimize=False)
rng = np.random.default_rng(7)
sys_ = FullSystem(s, calib)
for k in range(42):
    xi = np.array([0.05*k, 0.008*np.sin(0.2*k), 0.01*k, 0.0, 0.002*np.sin(0.11*k), 0.0])
    img,_ = scene.render(SE3.exp(xi))
    img = img + rng.normal(scale=1.5, size=img.shape).astype(np.float32)
    if k == 30:
        phases.clear()  # steady state only
        t_start = time.perf_counter()
    sys_.add_frame(img, 1.0, float(k), k)
total = time.perf_counter()-t_start
print("12 steady frames total:", round(total,2))
for n,v in sorted(phases.items(), key=lambda x:-x[1]):
    print(f"  {n}: {v:.2f}")
print("kf:", sys_.statistics['n_keyframes'])
