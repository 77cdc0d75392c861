#!/bin/bash
# Multi-host TPU pod-slice launcher — analog of the reference's Slurm
# scripts (scripts/cedar_run_playground_train.sh), re-targeted at the JAX
# distributed runtime: run this same command on every host of the slice
# (e.g. via gcloud compute tpus tpu-vm ssh --worker=all).
#
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 ./scripts/pod_run_train.sh NAME [k=v ...]
#
# Replicate arrays (independent seeds) are a loop over replicate_num, as in
# the reference's Slurm array (seed offset handled by the config system).
set -euo pipefail

NAME=${1:?usage: pod_run_train.sh NAME [k=v ...]}
shift

STAMP=$(date +%Y_%m_%d__%H_%M_%S)
DIR="runs/${STAMP}__${NAME}"
mkdir -p "$DIR"

exec python -m steppingstone_tpu.runtime.train \
  experiment_dir="$DIR" "$@" 2>&1 | tee "$DIR/train.out"
