#!/bin/bash
# Build the reference NALO-SLAM binary (sparse + dense paths) out-of-tree,
# without Boost/PCL/Ceres/Pangolin/cpu_tsdf installed:
#   - Eigen comes from tensorflow's bundled headers (plus an eigen3/ prefix alias)
#   - boost::thread -> std::thread shim (stubs/boost/)
#   - PCL plane RANSAC / PassThrough -> functional mini-implementations (stubs/pcl/)
#   - Ceres -> compile-time stub; Solve() is a no-op (only affects planeOpt=1 polish)
#   - cpu_tsdf/g2o -> no-op stubs (their live use is config-only / commented out)
#   - the Pangolin GUI + their main are not built; main_parity.cpp is our driver.
# Produces build/nalo_ref.
set -e
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
TF=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p build/obj build/eigenroot
ln -sfn "$TF" build/eigenroot/eigen3

CXXFLAGS="-std=c++14 -O2 -g -march=native -mno-avx512fp16 -w -DENABLE_SSE \
  -DCV_LOAD_IMAGE_GRAYSCALE=cv::IMREAD_GRAYSCALE \
  -DCV_LOAD_IMAGE_COLOR=cv::IMREAD_COLOR \
  -DCV_LOAD_IMAGE_UNCHANGED=cv::IMREAD_UNCHANGED \
  -I$REF/src -I$REF/thirdparty/Sophus -Istubs -I$TF -Ibuild/eigenroot \
  -I/usr/include/opencv4"

SRCS="
FullSystem/FullSystem.cpp
FullSystem/FullSystemOptimize.cpp
FullSystem/PlaneOptimize.cpp
FullSystem/FullSystemOptPoint.cpp
FullSystem/FullSystemDebugStuff.cpp
FullSystem/FullSystemMarginalize.cpp
FullSystem/Residuals.cpp
FullSystem/CoarseTracker.cpp
FullSystem/CoarseInitializer.cpp
FullSystem/ImmaturePoint.cpp
FullSystem/MapPoint.cpp
FullSystem/HessianBlocks.cpp
FullSystem/PixelSelector2.cpp
OptimizationBackend/EnergyFunctional.cpp
OptimizationBackend/AccumulatedTopHessian.cpp
OptimizationBackend/AccumulatedSCHessian.cpp
OptimizationBackend/EnergyFunctionalStructs.cpp
util/settings.cpp
util/Undistort.cpp
util/globalCalib.cpp
IOWrapper/OpenCV/ImageRW_OpenCV.cpp
IOWrapper/ImageDisplay_dummy.cpp
"

pids=()
objs=()
for s in $SRCS; do
  o="build/obj/$(echo "$s" | tr / _ | sed s/.cpp/.o/)"
  objs+=("$o")
  if [ ! -f "$o" ] || [ "$REF/src/$s" -nt "$o" ]; then
    g++ -c $CXXFLAGS "$REF/src/$s" -o "$o" &
    pids+=($!)
  fi
done
o="build/obj/main_parity.o"
objs+=("$o")
if [ ! -f "$o" ] || [ main_parity.cpp -nt "$o" ]; then
  g++ -c $CXXFLAGS main_parity.cpp -o "$o" &
  pids+=($!)
fi
fail=0
for p in "${pids[@]}"; do wait "$p" || fail=1; done
[ $fail -eq 0 ] || { echo "BUILD FAILED (compile)"; exit 1; }

g++ -o build/nalo_ref "${objs[@]}" \
  -lopencv_core -lopencv_imgcodecs -lopencv_imgproc -lopencv_highgui \
  -lpthread
echo "OK: build/nalo_ref"
