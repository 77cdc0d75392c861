"""Threshold-sampling analysis: does the 11x11 stone-sampling
distribution concentrate as the policy improves?

The paper's core mechanism (reference `playground/train.py:229-272`):
stone parameters are drawn ∝ softmax(-10 |V_norm - 0.85|), so probability
mass should migrate toward the frontier of the policy's competence and
sharpen over training. This script quantifies that from the pickled
per-round grids (`save_sampling_prob=True`):

  - entropy of each round's grid (uniform = log(121) ~ 4.80 nats)
  - mass in the easiest 3x3 corner vs the hardest ring over time

Usage: python scripts/sampling_prob_analysis.py runs/r3_w3d_threshold/*_sampling_prob.pkl
"""

import json
import pickle
import sys

import numpy as np


def main():
    path = sys.argv[1]
    with open(path, "rb") as f:
        probs = np.asarray(pickle.load(f))  # (K, 11, 11)
    K = probs.shape[0]
    ent = [float(-(p * np.log(p + 1e-12)).sum()) for p in probs]
    c = 5
    yi, pi = np.meshgrid(np.arange(11), np.arange(11), indexing="ij")
    ring = np.maximum(np.abs(yi - c), np.abs(pi - c))
    center_mass = [float(p[ring <= 1].sum()) for p in probs]   # easiest 3x3
    edge_mass = [float(p[ring >= 4].sum()) for p in probs]     # hardest rings

    def series(x, n=8):
        idx = np.linspace(0, K - 1, min(n, K)).astype(int)
        return {int(i): round(x[i], 3) for i in idx}

    out = {
        "rounds": K,
        "uniform_entropy": round(float(np.log(121)), 3),
        "entropy_over_rounds": series(ent),
        "entropy_first_vs_last": [round(ent[0], 3), round(ent[-1], 3)],
        "center3x3_mass_over_rounds": series(center_mass),
        "hard_ring_mass_over_rounds": series(edge_mass),
        "concentrated": bool(ent[-1] < 0.9 * np.log(121)),
    }

    # companion normalized-V grids (round-4 instrumentation): the prob
    # sharpness is bounded by the V spread — softmax(-10 |V - thr|) over a
    # grid whose normalized values span only d has logit range 10 d
    grid_path = path.replace("_sampling_prob.pkl", "_value_grid.pkl")
    try:
        with open(grid_path, "rb") as f:
            grids = np.asarray(pickle.load(f))  # (K, 11, 11) normalized V
        spread = [float(g.max() - g.min()) for g in grids]
        out["value_grid"] = {
            "normalized_spread_over_rounds": series(spread),
            "spread_first_vs_last": [round(spread[0], 3), round(spread[-1], 3)],
            "last_min_max": [round(float(grids[-1].min()), 3),
                             round(float(grids[-1].max()), 3)],
        }
    except FileNotFoundError:
        pass
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
