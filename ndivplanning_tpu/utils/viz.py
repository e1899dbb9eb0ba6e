"""Trajectory / scene visualisation (research-repo convenience, L9).

Matplotlib is imported lazily (Agg backend) so the hot path never pays
for it.  The canonical use is inspecting diversity: plot the k generated
candidates for one condition over the scene.
"""

from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_scene(ax, scene) -> None:
    """Draw bounds, obstacles, start (o) and goal (*) for one Scene."""
    obstacles = np.asarray(scene.obstacles)
    mask = np.asarray(scene.obstacle_mask)
    from matplotlib.patches import Circle

    for row, live in zip(obstacles, mask):
        if live > 0.5:
            ax.add_patch(Circle((row[0], row[1]), row[2], color="0.7"))
    start, goal = np.asarray(scene.start), np.asarray(scene.goal)
    ax.plot(*start, "go", markersize=9, label="start")
    ax.plot(*goal, "r*", markersize=13, label="goal")
    ax.set_xlim(-0.02, 1.02)
    ax.set_ylim(-0.02, 1.02)
    ax.set_aspect("equal")


def plot_trajectories(scene, taus, scores=None, path: str | None = None,
                      title: str = "", highlight=None):
    """Plot candidate trajectories ``taus: [N, H, 2]`` over a scene.

    If ``scores`` is given, colors run best (dark) to worst (light).
    ``highlight``: optional single ``[H, 2]`` trajectory drawn bold on
    top (e.g. the planner's best candidate).
    Returns the figure; saves to ``path`` if given.
    """
    plt = _mpl()
    taus = np.asarray(taus)
    fig, ax = plt.subplots(figsize=(5, 5))
    plot_scene(ax, scene)
    n = taus.shape[0]
    if scores is not None:
        order = np.argsort(np.asarray(scores))
        colors = plt.cm.viridis(np.linspace(0, 0.9, n))
        for rank, i in enumerate(order[::-1]):  # worst first, best on top
            ax.plot(taus[i, :, 0], taus[i, :, 1], "-",
                    color=colors[n - 1 - rank], lw=1, alpha=0.6)
    else:
        for i in range(n):
            ax.plot(taus[i, :, 0], taus[i, :, 1], "-", lw=1, alpha=0.6)
    if highlight is not None:
        h = np.asarray(highlight)
        ax.plot(h[:, 0], h[:, 1], "-", color="crimson", lw=2.5,
                label="best")
        ax.legend(loc="lower right")
    ax.set_title(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_loss_curves(history, path: str | None = None):
    """history: list of dict rows with 'step' and loss scalars."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    steps = [h["step"] for h in history]
    for key in ("d_loss", "g_adv", "g_ndiv"):
        if history and key in history[0]:
            ax.plot(steps, [h[key] for h in history], label=key)
    ax.set_xlabel("step")
    ax.legend()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_mpc_episode(scene, positions, reached=None, collided=None,
                     replan_every: int | None = None,
                     path: str | None = None, title: str = ""):
    """Render one closed-loop MPC episode: the executed path colored by
    time, with replan points marked.

    ``positions: [T, 2]`` executed states; ``replan_every`` marks every
    k-th state (where a new plan was drawn).  Returns the figure; saves
    to ``path`` if given.
    """
    plt = _mpl()
    pos = np.asarray(positions)
    fig, ax = plt.subplots(figsize=(5, 5))
    plot_scene(ax, scene)
    t = np.linspace(0.0, 1.0, len(pos))
    for i in range(len(pos) - 1):
        ax.plot(pos[i:i + 2, 0], pos[i:i + 2, 1], "-",
                color=plt.cm.plasma(t[i]), lw=2)
    if replan_every:
        marks = pos[::replan_every]
        ax.plot(marks[:, 0], marks[:, 1], "o", color="k", markersize=4,
                fillstyle="none", label="replan")
        ax.legend(loc="lower right")
    bits = [title] if title else []
    if reached is not None:
        bits.append(f"reached={float(reached):.0f}")
    if collided is not None:
        bits.append(f"collided={float(collided):.0f}")
    ax.set_title("  ".join(bits))
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_run_curves(rows, path: str | None = None, title: str = ""):
    """Two-panel training report from metrics.jsonl rows: losses over
    steps (log y) and the eval-metric curves (rows with kind='eval').

    Returns (figure, n_train_rows, n_eval_rows); saves to ``path`` if
    given.
    """
    plt = _mpl()
    train = [r for r in rows if r.get("kind") != "eval" and "step" in r]
    evals = [r for r in rows if r.get("kind") == "eval"]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    ax = axes[0]
    steps = [r["step"] for r in train]
    for key in ("d_loss", "g_adv", "g_ndiv", "g_total"):
        vals = [r[key] for r in train if key in r]
        if vals:
            ax.plot(steps[:len(vals)], vals, label=key, lw=1)
    ax.set_xlabel("step")
    ax.set_title("losses")
    ax.legend(fontsize=8)
    ax = axes[1]
    esteps = [r["step"] for r in evals]
    for key in ("eval_success_rate", "eval_collision_rate",
                "eval_mean_pairwise_dist", "raw_eval_success_rate"):
        vals = [r[key] for r in evals if key in r]
        if vals:
            ax.plot(esteps[:len(vals)], vals, "-o", label=key,
                    lw=1, markersize=3)
    ax.set_xlabel("step")
    ax.set_ylim(-0.02, 1.05)
    ax.set_title("frozen-suite eval")
    ax.legend(fontsize=8)
    fig.suptitle(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig, len(train), len(evals)
