#!/bin/bash
# Cassie extension: resume runs/r4_cassie (level 2 at 3e8) to 6e8 frames.
set -uo pipefail
cd "$(dirname "$0")/.."
COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"
for attempt in 1 2 3 4; do
  timeout 3600 python -m steppingstone_tpu.runtime.train \
    experiment_dir=runs/r4_cassie $COMMON resume=True \
    env_name=CassieStepper-v1 plank_class=LargePlank use_curriculum=True \
    use_phase_mirror=True num_ensembles=2 num_frames=6e8 \
    >> runs/r4_cassie/train.out 2>&1
  rc=$?
  [ $rc -eq 0 ] && break
  echo "cassie ext attempt $attempt exit $rc; resuming" >> runs/r4_cassie/train.out
  sleep 5
done
