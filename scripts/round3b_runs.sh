#!/bin/bash
# Round-3 follow-up queue: Cassie retrain after the stable-PD + spring
# damping + init-pose fixes, then complete the threshold-sampling run
# (its first attempt stalled on a dropped TPU-tunnel connection at
# update 210/244; total resume continues it).
set -uo pipefail
cd "$(dirname "$0")/.."

COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=4096 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"

echo "=== $(date +%T) cassie retrain"
mkdir -p runs/r3_cassie
timeout 7200 python -m steppingstone_tpu.runtime.train \
  experiment_dir=runs/r3_cassie $COMMON env_name=CassieStepper-v1 \
  use_curriculum=True use_phase_mirror=True num_ensembles=2 \
  num_frames=1e8 > runs/r3_cassie/train.out 2>&1
echo "=== $(date +%T) cassie done (exit $?)"; tail -1 runs/r3_cassie/train.out

echo "=== $(date +%T) threshold resume"
timeout 7200 python -m steppingstone_tpu.runtime.train \
  experiment_dir=runs/r3_w3d_threshold $COMMON \
  env_name=Walker3DStepperEnv-v0 use_threshold_sampling=True \
  save_sampling_prob=True plot_prob=True num_frames=1e8 resume=True \
  >> runs/r3_w3d_threshold/train.out 2>&1
echo "=== $(date +%T) threshold done (exit $?)"; tail -1 runs/r3_w3d_threshold/train.out
