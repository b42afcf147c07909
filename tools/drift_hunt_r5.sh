#!/bin/bash
# Round-5 drift hunt, CPU edition (NALO_PLATFORM=cpu): the axon tunnel
# wedges for long stretches, and accuracy parity does not need the TPU.
# Serialized for the 1-core host.  Produces per-frame forensics
# (logStuff=1 -> coarse_tracking a/b stream + ground/plane events) for
# every configuration the divergence could hide in.
#
# Usage: bash tools/drift_hunt_r5.sh [stage]
#   stage: refs | ours | ab | all (default all)
set -x
cd /root/repo
R=tools/refbuild/build/nalo_ref
STAGE=${1:-all}
export NALO_PLATFORM=cpu

if [ "$STAGE" = refs ] || [ "$STAGE" = all ]; then
  # sparse reference on the aff sequence WITH stdout kept (the
  # "Coarse Tracker tracked ab" stream feeds tools/drift_report.py)
  [ -f /tmp/pds_aff/ref_sparse.txt ] || $R files=/tmp/pds_aff/images \
     calib=/tmp/pds_aff/camera.txt masks=/tmp/pds_aff/masks \
     color=/tmp/pds_aff/colors preset=0 mode=1 lidar=0 dense=0 planeOpt=0 \
     output=/tmp/pds_aff/ref_sparse.txt > /tmp/ref_sparse_aff.log 2>&1
fi

run_ours () {  # name, extra args...
  local name=$1; shift
  mkdir -p /tmp/parity_$name
  python tools/parity_runner.py "$@" logStuff=1 \
     log=/tmp/parity_$name/metrics.jsonl gt=/tmp/pds_aff/gt.txt \
     out=/tmp/parity_$name > /tmp/ours_$name.log 2>&1
}

if [ "$STAGE" = ours ] || [ "$STAGE" = all ]; then
  # full NALO on aff: the 10.8x divergent case
  run_ours nalo_aff files=/tmp/pds_aff/images calib=/tmp/pds_aff/camera.txt \
     masks=/tmp/pds_aff/masks preset=0 lidar=1 dense=1 planeOpt=1 \
     ref=/tmp/pds_aff/ref_nalo.txt
  # decomposition: mask-fused selection only
  run_ours d1 files=/tmp/pds_aff/images calib=/tmp/pds_aff/camera.txt \
     masks=/tmp/pds_aff/masks preset=0 lidar=1 dense=0 planeOpt=0 \
     ref=/tmp/pds_aff/ref_nalo.txt
  # decomposition: + dense frontend, no plane
  run_ours d2 files=/tmp/pds_aff/images calib=/tmp/pds_aff/camera.txt \
     masks=/tmp/pds_aff/masks preset=0 lidar=1 dense=1 planeOpt=0 \
     ref=/tmp/pds_aff/ref_nalo.txt
  # sparse on aff (the r3 4x gap, now with forensics)
  run_ours sparse_aff files=/tmp/pds_aff/images \
     calib=/tmp/pds_aff/camera.txt masks=/tmp/pds_aff/masks preset=0 \
     lidar=0 dense=0 planeOpt=0 ref=/tmp/pds_aff/ref_sparse.txt
  # clean NALO control (parity must not regress while fixing drift)
  mkdir -p /tmp/parity_nalo_clean
  python tools/parity_runner.py files=/tmp/pds_clean/images \
     calib=/tmp/pds_clean/camera.txt masks=/tmp/pds_clean/masks preset=0 \
     lidar=1 dense=1 planeOpt=1 log=/tmp/parity_nalo_clean/metrics.jsonl \
     ref=/tmp/pds_clean/ref_nalo.txt gt=/tmp/pds_clean/gt.txt \
     out=/tmp/parity_nalo_clean > /tmp/ours_nalo_clean.log 2>&1
  # photometric mode=0 (VERDICT task 3)
  mkdir -p /tmp/parity_photo
  python tools/parity_runner.py files=/tmp/pds_photo/images \
     calib=/tmp/pds_photo/camera.txt mode=0 \
     gamma=/tmp/pds_photo/pcalib.txt vignette=/tmp/pds_photo/vignette.png \
     preset=0 lidar=0 dense=0 planeOpt=0 \
     ref=/tmp/pds_photo/ref.txt gt=/tmp/pds_photo/gt.txt \
     out=/tmp/parity_photo > /tmp/ours_photo.log 2>&1
fi

if [ "$STAGE" = ab ] || [ "$STAGE" = all ]; then
  # sw_gray_optimize budget A/B (VERDICT task 9): 50-iteration re-opt
  run_ours nalo_aff_r50 files=/tmp/pds_aff/images \
     calib=/tmp/pds_aff/camera.txt masks=/tmp/pds_aff/masks preset=0 \
     lidar=1 dense=1 planeOpt=1 planeReoptIters=50 \
     ref=/tmp/pds_aff/ref_nalo.txt
fi
echo DONE_DRIFT_HUNT