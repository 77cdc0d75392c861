#!/bin/bash
# Round-5 session-2 campaign: the session-1 runs/ directory was lost with
# the container (runs/ is gitignored; only reports/ artifacts survive),
# so this re-executes the full round-5 plan in verdict-priority order with
# session-1's calibrations baked in from the start:
#   - Cassie goes straight to 8e8 frames (session 1: level 4 at 5e8)
#   - thr150 gets the assist_bar + test-fleet gating from frame 0
#     (session 1 burned 2e8 frames before the bar existed)
# One JAX process at a time; every run executes under `timeout` in a
# resume loop (the tunneled TPU drops every ~1-2 h).
set -uo pipefail
cd "$(dirname "$0")/.."

COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"

# deterministic-gait hardening (verdict tasks 1+4): advance gates on the
# deterministic test fleet; exploration anneals once the top level is
# reached; kl_cutoff is MANDATORY with the anneal (runs/r5_w3d_noguard
# collapse, session 1)
HARDEN="test_curriculum=True advance_on_test=True \
  final_logstd=-2.5 anneal_updates=150 kl_cutoff=0.12"

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
  tail -2 "$dir/train.out" | cut -c1-160
}

stage=${1:-all}

if [ "$stage" = w3d ] || [ "$stage" = all ]; then
  # headline Walker3D at the REFERENCE budget (reference train.py:40),
  # hardened; replicate 1 of 3
  run runs/r5_w3d 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN
fi

if [ "$stage" = cassie ] || [ "$stage" = all ]; then
  # Cassie from scratch, straight to 8e8 (session 1: level 4 @ 5e8,
  # det test ~680/1000 bar); anneal from update 500 regardless of level
  run runs/r5_cassie 5400 env_name=CassieStepper-v1 \
    plank_class=LargePlank use_curriculum=True use_phase_mirror=True \
    num_ensembles=2 num_frames=8e8 \
    test_curriculum=True advance_on_test=True kl_cutoff=0.12 \
    final_logstd=-2.5 anneal_updates=400 anneal_start_update=500
fi

if [ "$stage" = thr ] || [ "$stage" = all ]; then
  # value-based capability run (task 2): scale-150 concentration + grid
  # assist ladder gated on the test fleet at assist_bar=700
  run runs/r5_thr150 3000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    save_sampling_prob=True plot_prob=True num_frames=3e8 \
    test_curriculum=True kl_cutoff=0.12
fi

if [ "$stage" = mike ] || [ "$stage" = all ]; then
  # Mike from scratch (task 3; reference README.md:36-45)
  run runs/r5_mike_scratch 3000 env_name=MikeStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=3e8 $HARDEN
fi

if [ "$stage" = seeds ] || [ "$stage" = all ]; then
  # replicates 2+3 (reference Slurm array analog,
  # cedar_run_playground_train.sh:36,43)
  run runs/r5_w3d_s2 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN \
    replicate_num=2
  run runs/r5_w3d_s3 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN \
    replicate_num=3
fi

if [ "$stage" = nostall ] || [ "$stage" = all ]; then
  # stall-rule fidelity A/B (task 6): rule OFF from scratch
  run runs/r5_w3d_nostall 2000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=1.5e8 \
    stall_timeout=0
fi

if [ "$stage" = valupd ] || [ "$stage" = all ]; then
  # value-update coupling end-to-end (task 8)
  run runs/r5_valupd 1800 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    use_value_update=True save_sampling_prob=True num_frames=1e8
fi

if [ "$stage" = spec ] || [ "$stage" = all ]; then
  # specialist schedule warm-started from the round-5 headline policy
  run runs/r5_specialist 1800 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_specialist=True num_frames=1e8 \
    net=runs/r5_w3d/checkpoints/best warm_start_logstd=-2.0 \
    kl_cutoff=0.12 lr_warmup_updates=20
fi

if [ "$stage" = evals ] || [ "$stage" = all ]; then
  bash scripts/round5_evals.sh
fi

echo "=== round5c queue done $(date +%T)"
