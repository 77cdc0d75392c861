#!/bin/bash
# Round-5 session-2 continuation: same queue as round5c.sh but with the
# behavior evals and demo artifacts INTERLEAVED after each training stage
# so a session cut never loses the eval for a finished run. (round5c's
# orchestrator shell was retired after r5_w3d; the w3d eval ran in the
# foreground before this script starts by resuming Cassie.)
set -uo pipefail
cd "$(dirname "$0")/.."

COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"
HARDEN="test_curriculum=True advance_on_test=True \
  final_logstd=-2.5 anneal_updates=150 kl_cutoff=0.12"
B="python scripts/behavior_eval.py"

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

if [ "$stage" = cassie ] || [ "$stage" = all ]; then
  run runs/r5_cassie 5400 env_name=CassieStepper-v1 \
    plank_class=LargePlank use_curriculum=True use_phase_mirror=True \
    num_ensembles=2 num_frames=8e8 \
    test_curriculum=True advance_on_test=True kl_cutoff=0.12 \
    final_logstd=-2.5 anneal_updates=400 anneal_start_update=500
  timeout 1200 $B runs/r5_cassie --platform axon --levels 0 2 4 5 \
    --plank_class LargePlank --env CassieStepper-v1 --ensembles 2 \
    --tag latest --out reports/behavior_r5_cassie.json
  timeout 900 python -m steppingstone_tpu.runtime.enjoy \
    --env CassieStepper-v1 --net runs/r5_cassie/checkpoints/latest \
    --num-ensembles 2 --plank-class LargePlank --curriculum 5 \
    --steps 600 --dump reports/demo/r5_cassie_traj.npz || true
  timeout 600 python -m steppingstone_tpu.viz.render \
    reports/demo/r5_cassie_traj.npz --out reports/demo/r5_cassie_walk.gif || true
fi

if [ "$stage" = thr ] || [ "$stage" = all ]; then
  run runs/r5_thr150 3000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    save_sampling_prob=True plot_prob=True num_frames=3e8 \
    test_curriculum=True kl_cutoff=0.12
  timeout 1200 $B runs/r5_thr150 --platform axon --levels 0 5 \
    --plank_class LargePlank --tag latest \
    --out reports/behavior_r5_threshold.json
  timeout 600 python scripts/sampling_prob_analysis.py runs/r5_thr150 \
    --out reports/sampling_prob_evolution_r5.png || true
fi

if [ "$stage" = mike ] || [ "$stage" = all ]; then
  run runs/r5_mike_scratch 3000 env_name=MikeStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=3e8 $HARDEN
  timeout 1200 $B runs/r5_mike_scratch --platform axon --levels 0 2 5 \
    --plank_class LargePlank --env MikeStepperEnv-v0 --tag latest \
    --out reports/behavior_r5_mike_scratch.json
fi

if [ "$stage" = w3d_ext ] || [ "$stage" = all ]; then
  # level-5 dwell continuation (verdict task 4: halve mid-track falls):
  # the 2e8 deterministic-gated run reaches level 5 late (update 185/488)
  # and evals at 76% fall-before-end; fork the headline run and continue
  # to 4e8 entirely at level 5 with the anneal floor held. The 2e8
  # parent (runs/r5_w3d) stays untouched for the seed-replicate claim.
  if [ ! -d runs/r5_w3d_ext ]; then
    cp -r runs/r5_w3d runs/r5_w3d_ext && rm -f runs/r5_w3d_ext/train.out
  fi
  run runs/r5_w3d_ext 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=4e8 $HARDEN
  timeout 1200 $B runs/r5_w3d_ext --platform axon --levels 5 \
    --plank_class LargePlank --tag latest \
    --out reports/behavior_r5_w3d_ext.json
  timeout 900 python -m steppingstone_tpu.runtime.enjoy \
    --env Walker3DStepperEnv-v0 --net runs/r5_w3d_ext/checkpoints/latest \
    --plank-class LargePlank --curriculum 5 --steps 600 \
    --dump reports/demo/r5_w3d_traj.npz || true
  timeout 600 python -m steppingstone_tpu.viz.render \
    reports/demo/r5_w3d_traj.npz --out reports/demo/r5_w3d_walk.gif || true
fi

if [ "$stage" = seeds ] || [ "$stage" = all ]; then
  run runs/r5_w3d_s2 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN \
    replicate_num=2
  run runs/r5_w3d_s3 2400 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=2e8 $HARDEN \
    replicate_num=3
  python -m steppingstone_tpu.viz.plot_from_csv \
    --load_paths runs/r5_w3d runs/r5_w3d_s2 runs/r5_w3d_s3 \
    --columns mean_rew test_mean_rew \
    --name_regex '.*(r5_w3d).*' --group 1 --smooth 5 \
    --out reports/learning_curves_r5.png || true
fi

if [ "$stage" = nostall ] || [ "$stage" = all ]; then
  run runs/r5_w3d_nostall 2000 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_curriculum=True num_frames=1.5e8 \
    stall_timeout=0
  timeout 1200 $B runs/r5_w3d_nostall --platform axon --levels 0 5 \
    --plank_class LargePlank --tag latest \
    --out reports/behavior_r5_nostall.json
fi

if [ "$stage" = valupd ] || [ "$stage" = all ]; then
  run runs/r5_valupd 1800 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_threshold_sampling=True \
    use_value_update=True save_sampling_prob=True num_frames=1e8
fi

if [ "$stage" = spec ] || [ "$stage" = all ]; then
  run runs/r5_specialist 1800 env_name=Walker3DStepperEnv-v0 \
    plank_class=LargePlank use_specialist=True num_frames=1e8 \
    net=runs/r5_w3d/checkpoints/best warm_start_logstd=-2.0 \
    kl_cutoff=0.12 lr_warmup_updates=20
  timeout 1200 $B runs/r5_specialist --platform axon --bands 0 1 2 3 \
    --specialists --plank_class LargePlank \
    --out reports/behavior_r5_specialist.json
  timeout 1200 $B runs/r5_w3d --platform axon --bands 0 1 2 3 \
    --tag latest --plank_class LargePlank \
    --out reports/behavior_r5_generalist_bands.json
fi

echo "=== round5d queue done $(date +%T)"
