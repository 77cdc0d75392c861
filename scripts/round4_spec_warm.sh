#!/bin/bash
# Specialist schedule demonstration from a competent warm start: the
# from-scratch specialist run (runs/r4_w3d_specialist) does not cross the
# 1000 bar inside 1e8 frames, so no specialist_k checkpoints get saved;
# warm-starting from the mastered Walker3D policy exercises the full
# save-specialist_k -> harden-band flow (reference train.py:119-122,542-549).
set -uo pipefail
cd "$(dirname "$0")/.."
COMMON="num_processes=1024 episode_steps=409600 mini_batch_size=1024 \
  num_tests=64 test_interval=10 mesh_devices=1 use_mirror=True \
  episode_log=True seed=8"
mkdir -p runs/r4_w3d_specialist_warm
for attempt in 1 2 3; do
  timeout 2000 python -m steppingstone_tpu.runtime.train \
    experiment_dir=runs/r4_w3d_specialist_warm $COMMON resume=True \
    env_name=Walker3DStepperEnv-v0 plank_class=LargePlank \
    use_specialist=True num_frames=1e8 \
    net=runs/r4_w3d/checkpoints/best warm_start_logstd=-2.0 \
    kl_cutoff=0.12 lr_warmup_updates=20 \
    >> runs/r4_w3d_specialist_warm/train.out 2>&1
  rc=$?
  [ $rc -eq 0 ] && break
  sleep 5
done
