#!/bin/bash
# Round-3 training queue: four sequential real-chip runs.
#   1. Walker3D full 2e8-frame fixed curriculum with the Pallas kernel
#      active (1024 envs = TILE multiple, 1-device mesh shard_map)
#   2. Walker3D threshold-sampling run (saves + renders sampling probs)
#   3. Mike fixed-curriculum run
#   4. Cassie fixed-curriculum run (PD + gait clock + 2-critic ensemble)
# Usage: nohup ./scripts/round3_runs.sh > runs/round3_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=4096 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"

run() {
  local dir=$1; shift
  echo "=== $(date +%T) starting $dir: $*"
  mkdir -p "$dir"
  timeout 7200 python -m steppingstone_tpu.runtime.train \
    experiment_dir="$dir" $COMMON "$@" > "$dir/train.out" 2>&1
  echo "=== $(date +%T) finished $dir (exit $?)"
  tail -2 "$dir/train.out"
}

run runs/r3_w3d_pallas env_name=Walker3DStepperEnv-v0 \
  use_curriculum=True num_frames=2e8

run runs/r3_w3d_threshold env_name=Walker3DStepperEnv-v0 \
  use_threshold_sampling=True save_sampling_prob=True plot_prob=True \
  num_frames=1e8

run runs/r3_mike env_name=MikeStepperEnv-v0 \
  use_curriculum=True num_frames=1e8

run runs/r3_cassie env_name=CassieStepper-v1 \
  use_curriculum=True use_phase_mirror=True num_ensembles=2 \
  num_frames=1e8

echo "=== queue done $(date +%T)"
