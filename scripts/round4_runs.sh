#!/bin/bash
# Round-4 training campaign (round-3 verdict tasks 1-5):
#   1. support-geometry A/B (disc curriculum vs reference-calibrated planks)
#   2. headline full-difficulty runs: Walker3D / Mike / Cassie on planks
#   3. threshold-sampling (2e8, instrumented), adaptive, specialist runs
#
# Hang resilience: the tunneled TPU drops silently every ~1-2 h, so every
# run executes under `timeout` in a resume loop — total resume restores
# params+opt+env+curriculum+PRNG from checkpoints/latest (<=10 updates
# lost). One JAX process at a time (2 host CPUs).
set -uo pipefail
cd "$(dirname "$0")/.."

# mini_batch_size=1024 is the REFERENCE learner shape (train.py:62):
# our batches are 10x the reference's 40k frames, and round-4's first A/B
# showed late-run learning was LR-floor-limited at 4096-row minibatches —
# matching the reference's minibatch size makes per-frame SGD-step count
# and per-step noise scale reference-equal (400 minibatches x 10 epochs
# per update, all inside the one compiled update program).
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
  grep -E "^curriculum" "$dir/train.out" | tail -2
  tail -2 "$dir/train.out" | cut -c1-160
}

stage=${1:-all}

if [ "$stage" = ab ] || [ "$stage" = all ]; then
  # --- support-geometry A/B (CALIBRATION.md protocol) -----------------
  # round 2 of the A/B: after the stall-timeout fix (standing exploit on
  # planks) and at the reference learner shape; the first arms are kept
  # as runs/r4_ab_{disc,plank} for the calibration note
  run runs/r4_ab_disc2 3000 env_name=Walker3DStepperEnv-v0 \
    use_curriculum=True num_frames=1.5e8
  run runs/r4_ab_plank2 3000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=1.5e8
fi

if [ "$stage" = headline ] || [ "$stage" = all ]; then
  # --- headline capability runs on the calibrated geometry ------------
  run runs/r4_w3d 2800 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=3e8
  # Mike warm-starts from the trained Walker3D policy (same skeleton,
  # 60/21 spaces) — the reference's own load_saved_controller flow
  # (train.py:147-153; it ships {env}_base.pt warm starts): from-scratch
  # Mike converges to the capped stall-standing optimum
  # (runs/r4_mike_scratch, mean pinned at ~421 for 1.9e8 frames)
  # warm-start stabilizers: the transplanted gait walks Mike perfectly
  # deterministically, but one unguarded 4000-step PPO update destroyed
  # it (ppo.py kl_cutoff rationale) — guard KL + warm the lr up
  run runs/r4_mike 2800 env_name=MikeStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=3e8 \
    net=runs/r4_w3d/checkpoints/best warm_start_logstd=-2.0 \
    kl_cutoff=0.12 lr_warmup_updates=20
  # Cassie trains from scratch: the reference's shipped base controller
  # does not survive transplant into our sim (runs/r4_cassie_basefail;
  # the round-3 transplant analysis pinned the same gap), and the r3
  # from-scratch Cassie learned steadily
  run runs/r4_cassie 3600 env_name=CassieStepper-v1 \
    plank_class=LargePlank use_curriculum=True use_phase_mirror=True \
    num_ensembles=2 num_frames=3e8
fi

if [ "$stage" = mike_ext ]; then
  # extension of the warm-started Mike run after the mirror-aware KL
  # guard fix (it froze at level 4 once asymmetry tripped the guard)
  run runs/r4_mike 2800 env_name=MikeStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=5.5e8 \
    net=runs/r4_w3d/checkpoints/best warm_start_logstd=-2.0 \
    kl_cutoff=0.12 lr_warmup_updates=20
fi

if [ "$stage" = sampling ] || [ "$stage" = all ]; then
  # --- curriculum-strategy runs (verdict tasks 4-5) -------------------
  run runs/r4_w3d_threshold 2800 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    save_sampling_prob=True plot_prob=True num_frames=2e8
  run runs/r4_w3d_adaptive 2000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_adaptive_sampling=True \
    save_sampling_prob=True plot_prob=True num_frames=1e8
  run runs/r4_w3d_specialist 2000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_specialist=True num_frames=1e8
fi

echo "=== queue done $(date +%T)"
