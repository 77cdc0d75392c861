#!/bin/bash
# Round-5 queue, phase 3: Cassie level-5 continuation jumps the queue
# (top verdict item — the 8e8 run walks deterministically, 0% falls at
# level 0, but plateaued at level 4 with det test ~906/1000), then the
# remaining round5d stages run unchanged via single-stage invocation.
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
  tail -2 "$dir/train.out" | cut -c1-160
}

# wait for any still-running queue step from round5d (the orchestrator
# was retired mid-gif; the enjoy/render child keeps the chip briefly)
while pgrep -x timeout > /dev/null 2>&1 && ps -ef | grep -E "runtime.enjoy|viz.render" | grep -vq grep; do
  sleep 10
done

# Cassie continuation: fork the 8e8 run; curriculum_bar=850 admits level
# 5 (det test crossed 906 by run end and was still climbing), 3e8 more
# frames of level-5 dwell with the anneal floor held
if [ ! -d runs/r5_cassie_ext ]; then
  cp -r runs/r5_cassie runs/r5_cassie_ext && rm -f runs/r5_cassie_ext/train.out
fi
run runs/r5_cassie_ext 3000 env_name=CassieStepper-v1 \
  plank_class=LargePlank use_curriculum=True use_phase_mirror=True \
  num_ensembles=2 num_frames=11e8 curriculum_bar=850 \
  test_curriculum=True advance_on_test=True kl_cutoff=0.12 \
  final_logstd=-2.5 anneal_updates=400 anneal_start_update=500
timeout 1200 python scripts/behavior_eval.py runs/r5_cassie_ext \
  --platform axon --levels 4 5 --plank_class LargePlank \
  --env CassieStepper-v1 --ensembles 2 --tag latest \
  --out reports/behavior_r5_cassie_ext.json
timeout 900 python -m steppingstone_tpu.runtime.enjoy \
  --env CassieStepper-v1 --net runs/r5_cassie_ext/checkpoints/latest \
  --num-ensembles 2 --plank-class LargePlank --curriculum 5 \
  --steps 600 --dump reports/demo/r5_cassie_traj.npz || true
timeout 600 python -m steppingstone_tpu.viz.render \
  reports/demo/r5_cassie_traj.npz --out reports/demo/r5_cassie_walk.gif || true

for st in thr mike w3d_ext seeds nostall valupd spec; do
  bash scripts/round5d.sh "$st"
done

echo "=== round5e queue done $(date +%T)"
