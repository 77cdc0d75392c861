#!/bin/bash
# Round-3 final training set, after the running-start + support-size
# curriculum fixes (commit d279f44): all four capability runs, walking.
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
  tail -1 "$dir/train.out" | cut -c1-160
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
