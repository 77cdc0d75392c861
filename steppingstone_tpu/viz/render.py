"""Offline trajectory renderer: .npz dumps -> animation / frames.

Replaces the reference's live PyBullet GUI + moviepy mp4 dump
(`playground/enjoy.py:348-377`, `common/render_utils.py`) with an offline
matplotlib renderer over the kinematic trajectories written by
`runtime/enjoy.py --dump`. This environment has no ffmpeg/moviepy, so
output is an animated GIF (PillowWriter) or a PNG contact sheet.

Usage:
  python -m steppingstone_tpu.viz.render traj.npz --out traj.gif [--fps 30]
  python -m steppingstone_tpu.viz.render traj.npz --out sheet.png --sheet 12
"""

from __future__ import annotations

import argparse

import numpy as np

# skeleton edges by body name (drawn if both endpoints exist)
_EDGES = [
    ("pelvis", "torso"),
    ("pelvis", "right_thigh"), ("right_thigh", "right_shin"),
    ("right_shin", "right_foot"),
    ("pelvis", "left_thigh"), ("left_thigh", "left_shin"),
    ("left_shin", "left_foot"),
    ("torso", "right_upper_arm"), ("right_upper_arm", "right_forearm"),
    ("torso", "left_upper_arm"), ("left_upper_arm", "left_forearm"),
    # cassie
    ("pelvis", "right_thigh"), ("right_thigh", "right_shin"),
    ("right_shin", "right_tarsus"), ("right_tarsus", "right_toe"),
    ("left_shin", "left_tarsus"), ("left_tarsus", "left_toe"),
]


def _edge_indices(names):
    idx = {n: i for i, n in enumerate(names)}
    out = []
    for a, b in _EDGES:
        if a in idx and b in idx and (idx[a], idx[b]) not in out:
            out.append((idx[a], idx[b]))
    return out


def draw_frame(ax, pos, edges, stones, stone_radius=0.25):
    ax.clear()
    # stones as discs (top-down uses circles; side view uses lines)
    th = np.linspace(0, 2 * np.pi, 24)
    for s in stones:
        ax.plot(s[0] + stone_radius * np.cos(th),
                s[1] + stone_radius * np.sin(th),
                s[2] * np.ones_like(th), color="#888", lw=0.8)
    for a, b in edges:
        ax.plot([pos[a, 0], pos[b, 0]], [pos[a, 1], pos[b, 1]],
                [pos[a, 2], pos[b, 2]], color="tab:blue", lw=2)
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], s=6, color="tab:red")
    c = pos[0]
    ax.set_xlim(c[0] - 2, c[0] + 2)
    ax.set_ylim(c[1] - 2, c[1] + 2)
    ax.set_zlim(c[2] - 1.5, c[2] + 1.5)
    ax.set_box_aspect((1, 1, 0.75))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--out", required=True)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--sheet", type=int, default=0,
                    help="write a PNG contact sheet with N frames instead")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(args.npz, allow_pickle=True)
    pos = data["body_pos"]              # (T, NB, 3)
    names = [str(n) for n in data["body_names"]]
    stones = data["stones"]
    edges = _edge_indices(names)

    if args.sheet:
        n = min(args.sheet, pos.shape[0])
        steps = np.linspace(0, pos.shape[0] - 1, n).astype(int)
        cols = min(n, 4)
        rows = (n + cols - 1) // cols
        fig = plt.figure(figsize=(4 * cols, 3.2 * rows))
        for i, t in enumerate(steps):
            ax = fig.add_subplot(rows, cols, i + 1, projection="3d")
            draw_frame(ax, pos[t], edges, stones)
            ax.set_title(f"t={t}", fontsize=8)
        fig.tight_layout()
        fig.savefig(args.out, dpi=100)
        print(f"wrote {args.out}")
        return

    from matplotlib.animation import FuncAnimation, PillowWriter

    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(projection="3d")
    frames = range(0, pos.shape[0], args.stride)

    def update(t):
        draw_frame(ax, pos[t], edges, stones)
        return []

    anim = FuncAnimation(fig, update, frames=frames, blit=False)
    anim.save(args.out, writer=PillowWriter(fps=args.fps))
    print(f"wrote {args.out} ({len(list(frames))} frames)")


if __name__ == "__main__":
    main()
