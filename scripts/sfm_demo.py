"""SfM demo: run the full image-driven pipeline on a rendered sequence and
plot recovered vs ground-truth camera trajectory + the sparse point cloud.

Writes artifacts/sfm_trajectory.png.  Usage: python scripts/sfm_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("SFM_DEMO_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_sfm_images import render_sequence

    from sift_tpu import SiftConfig
    from sift_tpu.models.geometry import rodrigues
    from sift_tpu.models.sfm import run_sfm

    frames, gt_centers = render_sequence(n_frames=6)
    k = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    cfg = SiftConfig(dtype=jnp.float32, extrema_cap=2048, kp_cap=1024, ori_cap=2048)
    res = run_sfm(frames, k, cfg, ba_iters=15)

    centers = np.stack(
        [
            -(np.asarray(rodrigues(jnp.asarray(res.poses[i, :3]))).T @ res.poses[i, 3:])
            for i in range(len(frames))
        ]
    )
    scale = np.linalg.norm(gt_centers[-1]) / max(np.linalg.norm(centers[-1]), 1e-9)
    centers = centers * scale
    pts = res.points * scale
    ate = float(np.sqrt(((centers - gt_centers) ** 2).sum(axis=1).mean()))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Reference palette (dataviz skill): blue=GT, orange=recovered, aqua=points.
    BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"
    INK, INK2, SURFACE = "#0b0b0b", "#52514e", "#fcfcfb"

    fig, axes = plt.subplots(1, 2, figsize=(10, 4.2), facecolor=SURFACE)
    for ax, (a, b, la, lb) in zip(
        axes, [(0, 2, "x [m]", "z [m]"), (0, 1, "x [m]", "y [m]")]
    ):
        ax.set_facecolor(SURFACE)
        ax.scatter(
            pts[:, a], pts[:, b], s=9, color=AQUA, alpha=0.55,
            linewidths=0, label="sparse points", zorder=1,
        )
        ax.plot(
            gt_centers[:, a], gt_centers[:, b], color=BLUE, lw=2,
            marker="o", ms=6, label="ground-truth camera track", zorder=3,
        )
        ax.plot(
            centers[:, a], centers[:, b], color=ORANGE, lw=2, ls="--",
            marker="s", ms=6, label="recovered (SIFT→PnP→BA)", zorder=4,
        )
        ax.annotate(
            "start", (gt_centers[0, a], gt_centers[0, b]),
            textcoords="offset points", xytext=(6, -12), fontsize=9, color=INK2,
        )
        ax.set_xlabel(la, color=INK2)
        ax.set_ylabel(lb, color=INK2)
        ax.grid(True, color="#e6e5e1", lw=0.6)
        for s in ax.spines.values():
            s.set_color("#d8d7d2")
        ax.tick_params(colors=INK2, labelsize=9)
    axes[0].set_title("top-down (x–z)", fontsize=10, color=INK)
    axes[1].set_title("lateral (x–y)", fontsize=10, color=INK)
    axes[1].legend(loc="upper right", fontsize=8, framealpha=0.9)
    fig.suptitle(
        f"Incremental SfM on a rendered 6-frame sequence — "
        f"ATE {ate*100:.1f} cm over a {np.linalg.norm(gt_centers[-1]):.2f} m track, "
        f"{res.info['n_points']} points",
        fontsize=11, color=INK,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "sfm_trajectory.png",
    )
    fig.savefig(out, dpi=150)
    print(f"{out}: ATE={ate:.4f}, points={res.info['n_points']}")


if __name__ == "__main__":
    main()
