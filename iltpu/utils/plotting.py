"""Metric line plots (reference utils.py:22-38): mean +- std band over the
per-step value lists, saved as PNG next to the metrics file."""

import os
from typing import List, Sequence

import numpy as np


def lineplot(
    x: Sequence[float],
    y: List[Sequence[float]],
    filename: str,
    xaxis: str = "Steps",
    yaxis: str = "Returns",
    title: str = "",
):
    """y is a list (per x) of per-episode/per-batch value lists; plots the
    mean with a +-1 std band, like the reference's seaborn lineplot with
    ci='sd' (utils.py:22-38)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x, np.float64)
    means = np.asarray([np.mean(v) for v in y], np.float64)
    stds = np.asarray([np.std(v) for v in y], np.float64)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(x, means, color="#1f77b4")
    ax.fill_between(x, means - stds, means + stds, color="#1f77b4", alpha=0.3)
    ax.set_xlabel(xaxis)
    ax.set_ylabel(yaxis)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(f"{filename}.png", dpi=100)
    plt.close(fig)
