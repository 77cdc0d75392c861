#!/bin/bash
# Round-5 stage B: Cassie extension toward level 5, then the on-chip
# evaluation batch (behavior JSONs, specialist-vs-generalist bands,
# seed-band curves, trajectory dumps for gifs).
set -uo pipefail
cd "$(dirname "$0")/.."

COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"

run() {
  local dir=$1 tmo=$2; shift 2
  echo "=== $(date +%T) starting $dir: $*"
  mkdir -p "$dir"
  local attempt rc
  for attempt in 1 2 3 4; do
    timeout "$tmo" python -m steppingstone_tpu.runtime.train \
      experiment_dir="$dir" $COMMON resume=True "$@" >> "$dir/train.out" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then break; fi
    echo "=== $(date +%T) $dir attempt $attempt exit $rc; resuming"
    sleep 5
  done
  echo "=== $(date +%T) finished $dir (exit $rc)"
}

stage=${1:-all}

if [ "$stage" = cassie_ext ] || [ "$stage" = all ]; then
  # extend Cassie 5e8 -> 8e8: ended round at level 4 (deterministic test
  # ~680, bar 1000); anneal already complete, KL guard on
  run runs/r5_cassie 3600 env_name=CassieStepper-v1 \
    plank_class=LargePlank use_curriculum=True use_phase_mirror=True \
    num_ensembles=2 num_frames=8e8 \
    test_curriculum=True advance_on_test=True kl_cutoff=0.12 \
    final_logstd=-2.5 anneal_updates=400 anneal_start_update=500
fi

if [ "$stage" = thr_ext ] || [ "$stage" = all ]; then
  # extend the threshold run 2e8 -> 4e8 with the working assist bar
  # (assist_bar=700 default; the first 2e8 ran before the bar existed and
  # the ladder never moved off the carpet)
  run runs/r5_thr150 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    save_sampling_prob=True plot_prob=True num_frames=4e8
fi

if [ "$stage" = evals ] || [ "$stage" = all ]; then
  bash scripts/round5_evals.sh
fi

echo "=== stage B done $(date +%T)"
