"""Generic trajectory and tube plotting (reference util/plot.py:6-74 parity)."""

from __future__ import annotations

import numpy as np


def plot_nominal_trajectory(X, dt=0.05, time=None, ax=None, labels=None):
    """X: (nx, T) nominal trajectory."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(10, 6))
    X = np.asarray(X)
    if time is None:
        time = np.arange(X.shape[1]) * dt
    colors = plt.cm.viridis(np.linspace(0, 1, X.shape[0] + 2))
    for i in range(X.shape[0]):
        lbl = labels[i] if labels else None
        ax.plot(time, X[i], color=colors[i + 1], label=lbl)
    if labels:
        ax.legend()
    return ax


def plot_tube(backoff, center, dt=0.05, time=None, ax=None, alpha=0.5, margin=1e-6):
    """fill_between center +- backoff per state (reference util/plot.py:38)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=(10, 6))
    backoff = np.asarray(backoff)
    center = np.asarray(center)
    if backoff.shape[0] != center.shape[0]:
        backoff = backoff.T
    if time is None:
        time = np.arange(center.shape[1]) * dt
    colors = plt.cm.viridis(np.linspace(0, 1, center.shape[0] + 2))
    for i in range(center.shape[0]):
        lo = center[i] - backoff[i] + margin
        hi = center[i] + backoff[i] - margin
        ax.fill_between(time, lo, hi, color=colors[i + 1], alpha=alpha)
    return ax


def add_footnote_time(fig):
    """Timestamp footnote (reference util/footnote.py)."""
    from datetime import datetime

    fig.text(
        0.99, 0.01, datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        ha="right", va="bottom", fontsize=6, alpha=0.5,
    )


def rectangle_coordinates(center, width, height):
    """Corner coordinates of an axis-aligned rectangle
    (reference util/rectangle_coordinates.py, without its import-time demo)."""
    cx, cy = center
    return np.array(
        [
            [cx - width / 2, cy - height / 2],
            [cx + width / 2, cy - height / 2],
            [cx + width / 2, cy + height / 2],
            [cx - width / 2, cy + height / 2],
        ]
    )
