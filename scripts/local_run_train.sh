#!/bin/bash
# Local launcher — analog of the reference's
# scripts/local_run_playground_train.sh: nohup + pid file + log file.
#
#   ./scripts/local_run_train.sh EXPERIMENT_NAME [k=v ...]
set -euo pipefail

if [ $# -lt 1 ]; then
  echo "usage: $0 EXPERIMENT_NAME [k=v ...]" >&2
  exit 1
fi

NAME=$1
shift

STAMP=$(date +%Y_%m_%d__%H_%M_%S)
DIR="runs/${STAMP}__${NAME}"
mkdir -p "$DIR"

nohup python -m steppingstone_tpu.runtime.train \
  experiment_dir="$DIR" "$@" > "$DIR/train.out" 2>&1 &

echo $! > "$DIR/pid"
echo "started: $DIR (pid $(cat "$DIR/pid"))"
