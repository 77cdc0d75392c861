#!/bin/bash
# Round-5 evaluation batch: 256-env deterministic behavior evals on-chip
# for every round-5 policy, plus seed-band learning curves.
set -uo pipefail
cd "$(dirname "$0")/.."
B="python scripts/behavior_eval.py"
set -x
$B runs/r5_w3d     --platform axon --levels 0 2 5 --plank_class LargePlank --tag latest --out reports/behavior_r5_w3d.json > /dev/null
$B runs/r5_cassie  --platform axon --levels 0 2 4 5 --plank_class LargePlank --env CassieStepper-v1 --ensembles 2 --tag latest --out reports/behavior_r5_cassie.json > /dev/null
$B runs/r5_thr150  --platform axon --levels 0 5 --plank_class LargePlank --tag latest --out reports/behavior_r5_threshold.json > /dev/null
$B runs/r5_mike_scratch --platform axon --levels 0 2 5 --plank_class LargePlank --env MikeStepperEnv-v0 --tag latest --out reports/behavior_r5_mike_scratch.json > /dev/null
$B runs/r5_w3d_nostall --platform axon --levels 0 5 --plank_class LargePlank --tag latest --out reports/behavior_r5_nostall.json > /dev/null
# specialist-vs-generalist per difficulty band (verdict task 8)
$B runs/r5_specialist --platform axon --bands 0 1 2 3 --specialists --plank_class LargePlank --out reports/behavior_r5_specialist.json > /dev/null
$B runs/r5_w3d --platform axon --bands 0 1 2 3 --tag latest --plank_class LargePlank --out reports/behavior_r5_generalist_bands.json > /dev/null
# seed-replicate band curves (verdict task 5)
python -m steppingstone_tpu.viz.plot_from_csv \
  --load_paths runs/r5_w3d runs/r5_w3d_s2 runs/r5_w3d_s3 \
  --columns mean_rew test_mean_rew \
  --name_regex '.*(r5_w3d).*' --group 1 --smooth 5 \
  --out reports/learning_curves_r5.png
set +x
echo "evals done"
