"""nalo_slam_tpu — a TPU-native (JAX/XLA/Pallas) monocular direct SLAM framework.

A from-scratch rebuild of the capabilities of NALO-SLAM (a DSO-derived
photometric odometry system extended with a LiDAR-learned mask prior, dense
mask-guided frontend tracking, a ground-plane scale constraint and dense
surfel/TSDF mapping; see /root/reference) designed TPU-first:

* all hot loops are fixed-shape, batched JAX computations (vmap/scan/pallas),
* the sliding window lives in padded slot arrays so XLA sees constant shapes,
* tiny irregular linear algebra (the (4+8F)^2 window solve, marginalization)
  runs on the host in float64, mirroring the reference's double-precision
  stitch (reference: src/OptimizationBackend/AccumulatedTopHessian.cpp:171).
"""

__version__ = "0.1.0"
