"""Trajectory plotting (reference: matplotlib XY path overlays in
``test.py``/visualization — SURVEY.md §2.6). Import-gated: plotting is an
optional extra; everything else works without matplotlib."""

from __future__ import annotations

from typing import Dict

import numpy as np


def plot_trajectories(trajs: Dict[str, np.ndarray], out_path: str,
                      title: str = ""):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    for name, Ts in trajs.items():
        p = Ts[:, :3, 3]
        ax.plot(p[:, 0], p[:, 1], label=name, linewidth=1.2)
        ax.scatter([p[0, 0]], [p[0, 1]], marker="o", s=30)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    ax.legend()
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
