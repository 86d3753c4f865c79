"""Metric analysis and plotting (reference utils/plot.py / tools/analyse.py).

Compares two runs' per-file metric outputs (the ranked txt files written by
cli/calculate_metrics.py) and draws histograms of the deltas.
"""

from __future__ import annotations

import os

import numpy as np


def load_metric_file(path: str) -> dict:
    """Parse a `{metric}.txt` written by cli/calculate_metrics.py:
    first line `mean: X`, then `value\\tpath` lines. Returns {basename: value}."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("mean:"):
                continue
            value, fpath = line.split("\t")
            out[os.path.basename(fpath)] = float(value)
    return out


def compare_two_runs(path_a: str, path_b: str) -> dict:
    """Per-file deltas between runs (utils/plot.py compare_two_data)."""
    a = load_metric_file(path_a)
    b = load_metric_file(path_b)
    common = sorted(set(a) & set(b))
    deltas = {k: b[k] - a[k] for k in common}
    values = np.asarray(list(deltas.values())) if deltas else np.zeros(0)
    return {
        "per_file": deltas,
        "mean_delta": float(values.mean()) if len(values) else 0.0,
        "improved": int((values > 0).sum()),
        "regressed": int((values < 0).sum()),
    }


def draw_hist(values, title: str = "", out_path: str | None = None, bins: int = 50):
    """Histogram of metric values/deltas (utils/plot.py draw_hist)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.hist(np.asarray(list(values)), bins=bins)
    ax.set_title(title)
    ax.set_xlabel("value")
    ax.set_ylabel("count")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig
