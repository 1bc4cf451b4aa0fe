"""Reliability-diagram plotting (reference ``tools/plot.py:8-72``).

Renders per-bin accuracy bars against the identity line with the gap
hatched, annotated with ECE. Matplotlib runs headless (Agg).
"""

from __future__ import annotations

import numpy as np


def plot_reliability_diagram(preds, confs, labels, n_bins: int = 15,
                             title=None, save_dir=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    preds = np.asarray(preds)
    confs = np.asarray(confs, np.float64)
    labels = np.asarray(labels)

    bins = np.linspace(0, 1, n_bins + 1)
    idx = np.digitize(confs, bins) - 1
    bin_acc = np.zeros(n_bins)
    bin_conf = np.zeros(n_bins)
    for i in range(n_bins):
        in_bin = idx == i
        if in_bin.any():
            bin_acc[i] = np.mean(labels[in_bin] == preds[in_bin])
            bin_conf[i] = np.mean(confs[in_bin])
    weights = np.histogram(confs, bins)[0] / len(confs)
    ece = np.sum(weights * np.abs(bin_conf - bin_acc))

    delta = 1.0 / n_bins
    x = np.arange(0, 1, delta)
    mid = np.linspace(delta / 2, 1 - delta / 2, n_bins)
    gap = np.abs(mid - bin_acc)

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.grid(color="tab:grey", linestyle=(0, (1, 5)), linewidth=1, zorder=0)
    ax.bar(x, bin_acc, color="b", width=delta, align="edge",
           edgecolor="k", label="Outputs", zorder=5)
    ax.bar(x, gap, bottom=np.minimum(bin_acc, mid), color="mistyrose",
           alpha=0.5, width=delta, align="edge", edgecolor="r", hatch="/",
           label="Gap", zorder=10)
    ax.plot([0, 1], [0, 1], linestyle="--", color="tab:grey", zorder=15)
    ax.set_ylabel("Accuracy", fontsize=13)
    ax.set_xlabel("Confidence", fontsize=13)
    ax.legend(loc="upper left", framealpha=1.0, fontsize="medium")
    ax.text(0.025, 0.85, f"ECE: {ece * 100:.2f}%", transform=ax.transAxes,
            bbox=dict(boxstyle="round, pad=0.5", facecolor="wheat",
                      edgecolor="orange"))
    if title is not None:
        ax.set_title(title, fontsize=16)
    fig.tight_layout()
    if save_dir is not None:
        fig.savefig(save_dir)
    plt.close(fig)
    return ece


def plot_proximity_conf(proximity, conf, save_dir, sort_by_conf=True):
    """Scatter of sample proximity vs confidence (analysis helper,
    reference ``tools/plot.py:75-119``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    proximity = np.asarray(proximity, np.float64)
    conf = np.asarray(conf, np.float64)
    order = np.argsort(conf if sort_by_conf else proximity)
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.scatter(proximity[order], conf[order], s=4, alpha=0.3)
    ax.set_xlabel("Proximity")
    ax.set_ylabel("Confidence")
    fig.tight_layout()
    fig.savefig(save_dir)
    plt.close(fig)


def plot_proximity_acc_ece(proximity, pred, label, conf, save_dir,
                           n_bins: int = 10):
    """Per-proximity-quantile accuracy / confidence / ECE panels
    (analysis helper, reference ``tools/plot.py:140-225``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from .metrics import ECE, _quantile_bins

    proximity = np.asarray(proximity, np.float64)
    pred = np.asarray(pred)
    label = np.asarray(label)
    conf = np.asarray(conf, np.float64)
    bin_ids = _quantile_bins(proximity, n_bins)

    accs, confs, eces, centers = [], [], [], []
    for b in range(n_bins):
        in_bin = bin_ids == b
        if not in_bin.any():
            continue
        accs.append(np.mean(pred[in_bin] == label[in_bin]))
        confs.append(np.mean(conf[in_bin]))
        eces.append(ECE(conf[in_bin], pred[in_bin], label[in_bin]))
        centers.append(np.mean(proximity[in_bin]))

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, ys, name in zip(axes, (accs, confs, eces),
                            ("Accuracy", "Confidence", "ECE")):
        ax.plot(centers, ys, marker="o")
        ax.set_xlabel("Proximity (bin mean)")
        ax.set_ylabel(name)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(save_dir)
    plt.close(fig)
