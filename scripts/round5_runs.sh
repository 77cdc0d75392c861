#!/bin/bash
# Round-5 training campaign (round-4 verdict tasks 1-8):
#   1. Cassie: deterministic walking gait via the logstd anneal +
#      deterministic advance gating (verdict task 1)
#   2. value-based capability run: threshold scale-150 + grid assist
#      ladder (task 2)
#   3. Mike from scratch (task 3)
#   4. hardened W3D at the reference 2e8 budget, x3 seed replicates
#      (tasks 4+5)
#   5. stall-rule-off fidelity A/B (task 6)
#   6. value-update coupling + specialist behavior (task 8)
#
# One JAX process at a time (2 host CPUs); every run executes under
# `timeout` in a resume loop (the tunneled TPU drops every ~1-2 h; total
# resume restores params+opt+env+curriculum+PRNG from checkpoints/latest).
set -uo pipefail
cd "$(dirname "$0")/.."

COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"

# hardening (tasks 1+4): mirror the fixed level onto the deterministic
# test fleet, gate advances on its mean (the deterministic/stochastic gap
# closer), and anneal exploration down once the top level is reached so
# the MEAN action carries the gait the behavior evals measure.
# kl_cutoff is MANDATORY with the anneal: log-prob gradients scale
# 1/sigma^2, and the unguarded first attempt collapsed 786 -> 221 in 10
# updates the moment the cap pinned at -2.5 (runs/r5_w3d_noguard,
# progress.csv iters 401-411)
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
  grep -E "^curriculum|^assist|^logstd anneal" "$dir/train.out" | tail -3
  tail -2 "$dir/train.out" | cut -c1-160
}

stage=${1:-all}

if [ "$stage" = w3d ] || [ "$stage" = all ]; then
  # headline Walker3D at the REFERENCE frame budget (train.py:40),
  # hardened (task 4); replicate 1 of 3 (task 5)
  run runs/r5_w3d 2000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN
fi

if [ "$stage" = cassie ] || [ "$stage" = all ]; then
  # Cassie from scratch (the shipped base controller does not survive
  # transplant, runs/r4_cassie_basefail): deterministic-gait attack =
  # anneal from mid-run regardless of level + deterministic advance gate
  run runs/r5_cassie 3600 env_name=CassieStepper-v1 \
    plank_class=LargePlank use_curriculum=True use_phase_mirror=True \
    num_ensembles=2 num_frames=5e8 \
    test_curriculum=True advance_on_test=True kl_cutoff=0.12 \
    final_logstd=-2.5 anneal_updates=400 anneal_start_update=500
fi

if [ "$stage" = seeds ] || [ "$stage" = all ]; then
  # replicates 2+3 (reference Slurm array analog,
  # cedar_run_playground_train.sh:36,43: seed += (rep-1)*num_processes)
  run runs/r5_w3d_s2 2000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN \
    replicate_num=2
  run runs/r5_w3d_s3 2000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN \
    replicate_num=3
fi

if [ "$stage" = thr ] || [ "$stage" = all ]; then
  # value-based capability run (task 2): scale-150 concentration
  # (config default) + the grid assist ladder (carpet -> calibrated on
  # the same mean>1000 rule the fixed path uses)
  run runs/r5_thr150 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    save_sampling_prob=True plot_prob=True num_frames=2e8
fi

if [ "$stage" = mike ] || [ "$stage" = all ]; then
  # Mike from scratch (task 3; reference README.md:36-45)
  run runs/r5_mike_scratch 2400 env_name=MikeStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=3e8 $HARDEN
fi

if [ "$stage" = nostall ] || [ "$stage" = all ]; then
  # stall-rule fidelity A/B (task 6): rule OFF, from scratch — does
  # walking dominate standing naturally after the exemption fix +
  # calibrated geometry?
  run runs/r5_w3d_nostall 1500 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=1.5e8 \
    stall_timeout=0
fi

if [ "$stage" = valupd ] || [ "$stage" = all ]; then
  # value-update coupling driven end-to-end (task 8): threshold +
  # alternating value-only updates at 10x lr with the reference's
  # update_curriculum(5) coupling (train.py:224-228)
  run runs/r5_valupd 1500 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    use_value_update=True save_sampling_prob=True num_frames=1e8
fi

if [ "$stage" = spec ] || [ "$stage" = all ]; then
  # specialist schedule warm-started from the round-5 headline policy;
  # behavior-eval specialists vs generalist afterwards (task 8)
  run runs/r5_specialist 1500 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_specialist=True num_frames=1e8 \
    net=runs/r5_w3d/checkpoints/best warm_start_logstd=-2.0 \
    kl_cutoff=0.12 lr_warmup_updates=20
fi

echo "=== queue done $(date +%T)"
