#!/bin/bash
# Round-4 evaluation batch: ≥256-env behavior evals on-chip for every
# committed policy (verdict task 7), written to reports/.
set -uo pipefail
cd "$(dirname "$0")/.."
B="python scripts/behavior_eval.py"
set -x
$B runs/r4_w3d       --platform axon --levels 0 2 5 --plank_class LargePlank --tag latest --out reports/behavior_r4_w3d.json > /dev/null
$B runs/r4_mike      --platform axon --levels 0 2 5 --plank_class LargePlank --env MikeStepperEnv-v0 --tag latest --out reports/behavior_r4_mike.json > /dev/null
$B runs/r4_cassie    --platform axon --levels 0 2 3 --plank_class LargePlank --env CassieStepper-v1 --ensembles 2 --tag latest --out reports/behavior_r4_cassie.json > /dev/null
$B runs/r4_w3d_threshold --platform axon --levels 0 5 --plank_class LargePlank --tag latest --out reports/behavior_r4_threshold.json > /dev/null
$B runs/r4_w3d_adaptive  --platform axon --levels 0 5 --plank_class LargePlank --tag latest --out reports/behavior_r4_adaptive.json > /dev/null
set +x
echo "evals done"
