#!/bin/bash
# Round-5 parity pipeline: NALO-mode head-to-head (clean + affine-drift)
# plus the drift DECOMPOSITION runs that isolate which NALO stage
# amplifies the brightness-drift error (VERDICT r4 tasks 2/4), plus the
# photometric mode=0 run (task 3).
#
# Usage: bash tools/parity_r5.sh [stage]
#   stage: datasets | ref | ours | decomp | photo | all (default all)
set -x
cd /root/repo
R=tools/refbuild/build/nalo_ref
STAGE=${1:-all}

if [ "$STAGE" = datasets ] || [ "$STAGE" = all ]; then
  [ -d /tmp/pds_clean/images ] || python tools/make_parity_dataset.py \
      outdir=/tmp/pds_clean frames=350 amp_a=0 amp_b=0 noise=0 > /tmp/gen_clean.log 2>&1 &
  P1=$!
  [ -d /tmp/pds_aff/images ] || python tools/make_parity_dataset.py \
      outdir=/tmp/pds_aff frames=350 > /tmp/gen_aff.log 2>&1 &
  P2=$!
  # photometric: clean motion, gamma+vignette distortion + calib files
  [ -d /tmp/pds_photo/images ] || python tools/make_parity_dataset.py \
      outdir=/tmp/pds_photo frames=350 amp_a=0 amp_b=0 noise=0 \
      gamma=2.2 vignette=1 > /tmp/gen_photo.log 2>&1 &
  P3=$!
  wait $P1 $P2 $P3
fi

if [ "$STAGE" = ref ] || [ "$STAGE" = all ]; then
  for d in clean aff; do
    [ -f /tmp/pds_$d/ref_nalo.txt ] || $R files=/tmp/pds_$d/images \
       calib=/tmp/pds_$d/camera.txt masks=/tmp/pds_$d/masks \
       color=/tmp/pds_$d/colors preset=0 mode=1 lidar=1 dense=1 planeOpt=1 \
       output=/tmp/pds_$d/ref_nalo.txt > /tmp/ref_nalo_$d.log 2>&1 &
  done
  # reference photometric mode=0 (gamma+vignette undistortion active)
  # lidar=0 keeps the run sparse, but masks=/color= must still be passed:
  # the reference's getImage_internal unconditionally reads masks[id] and
  # colors[id] (DatasetReader.h:296-313) and segfaults on empty folders,
  # and setting_useLidar defaults to 1 (settings.cpp:34).
  [ -f /tmp/pds_photo/ref.txt ] || $R files=/tmp/pds_photo/images \
     calib=/tmp/pds_photo/camera.txt gamma=/tmp/pds_photo/pcalib.txt \
     vignette=/tmp/pds_photo/vignette.png masks=/tmp/pds_photo/masks \
     color=/tmp/pds_photo/colors preset=0 mode=0 lidar=0 \
     output=/tmp/pds_photo/ref.txt > /tmp/ref_photo.log 2>&1 &
  wait
fi

if [ "$STAGE" = ours ] || [ "$STAGE" = all ]; then
  # full NALO head-to-head (the r5 headline numbers), serialized on the TPU
  for d in clean aff; do
    python tools/parity_runner.py files=/tmp/pds_$d/images \
       calib=/tmp/pds_$d/camera.txt masks=/tmp/pds_$d/masks preset=0 \
       lidar=1 dense=1 planeOpt=1 log=/tmp/parity_nalo_$d/metrics.jsonl \
       ref=/tmp/pds_$d/ref_nalo.txt gt=/tmp/pds_$d/gt.txt \
       out=/tmp/parity_nalo_$d > /tmp/ours_nalo_$d.log 2>&1
  done
fi

if [ "$STAGE" = decomp ] || [ "$STAGE" = all ]; then
  # drift decomposition on the aff sequence: which stage amplifies?
  # d1: mask-fused selection only; d2: +dense frontend; (full = above)
  python tools/parity_runner.py files=/tmp/pds_aff/images \
     calib=/tmp/pds_aff/camera.txt masks=/tmp/pds_aff/masks preset=0 \
     lidar=1 dense=0 planeOpt=0 log=/tmp/parity_d1/metrics.jsonl \
     ref=/tmp/pds_aff/ref_nalo.txt gt=/tmp/pds_aff/gt.txt \
     out=/tmp/parity_d1 > /tmp/ours_d1.log 2>&1
  python tools/parity_runner.py files=/tmp/pds_aff/images \
     calib=/tmp/pds_aff/camera.txt masks=/tmp/pds_aff/masks preset=0 \
     lidar=1 dense=1 planeOpt=0 log=/tmp/parity_d2/metrics.jsonl \
     ref=/tmp/pds_aff/ref_nalo.txt gt=/tmp/pds_aff/gt.txt \
     out=/tmp/parity_d2 > /tmp/ours_d2.log 2>&1
fi

if [ "$STAGE" = photo ] || [ "$STAGE" = all ]; then
  python tools/parity_runner.py files=/tmp/pds_photo/images \
     calib=/tmp/pds_photo/camera.txt mode=0 \
     gamma=/tmp/pds_photo/pcalib.txt vignette=/tmp/pds_photo/vignette.png \
     preset=0 lidar=0 dense=0 planeOpt=0 \
     ref=/tmp/pds_photo/ref.txt gt=/tmp/pds_photo/gt.txt \
     out=/tmp/parity_photo > /tmp/ours_photo.log 2>&1
fi
echo DONE_PARITY_R5
