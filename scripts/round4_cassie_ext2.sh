#!/bin/bash
# Cassie recovery extension: the post-hang resumed segment (updates
# 1441-1464) trained on garbage rollouts (see reports/ROUND4.md); resume
# from the last pre-hang numbered checkpoint (frame 5.8e8, copied over
# `latest`) and extend to 7e8.
set -uo pipefail
cd "$(dirname "$0")/.."
COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"
for attempt in 1 2 3; do
  timeout 2400 python -m steppingstone_tpu.runtime.train \
    experiment_dir=runs/r4_cassie $COMMON resume=True \
    env_name=CassieStepper-v1 plank_class=LargePlank use_curriculum=True \
    use_phase_mirror=True num_ensembles=2 num_frames=7e8 \
    >> runs/r4_cassie/train.out 2>&1
  rc=$?
  [ $rc -eq 0 ] && break
  echo "cassie ext2 attempt $attempt exit $rc; resuming" >> runs/r4_cassie/train.out
  sleep 5
done
