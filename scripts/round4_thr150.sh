#!/bin/bash
# Threshold sampling at the config's sampling_scale=150 (see
# ThresholdSampling docstring): demonstration run for visible
# concentration; runs/r4_w3d_threshold is the scale-10 active-path twin.
set -uo pipefail
cd "$(dirname "$0")/.."
COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"
mkdir -p runs/r4_w3d_threshold150
for attempt in 1 2 3; do
  timeout 2000 python -m steppingstone_tpu.runtime.train \
    experiment_dir=runs/r4_w3d_threshold150 $COMMON resume=True \
    env_name=Walker3DStepperEnv-v0 plank_class=LargePlank \
    use_threshold_sampling=True save_sampling_prob=True plot_prob=True \
    sampling_scale=150 num_frames=1e8 \
    >> runs/r4_w3d_threshold150/train.out 2>&1
  rc=$?
  [ $rc -eq 0 ] && break
  sleep 5
done
