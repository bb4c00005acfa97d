"""Regenerate box_cert.png: per-cell MC collision-% box plots, all arms.

Reads the compare-format stats npzs written by `cli.validate --compare`
(see run_cert_ext2.sh) — one panel per cell, one box per arm, joined on
the scenarios every arm accepted.  Means annotated; promoted arms bolded.
"""

import os

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
ARMS = ("mmd_opt", "fast64x14", "fast64x12", "fast64x10",
        "fastrt64x12", "fastrt64x10", "cvar")
PROMOTED = {"fast64x12", "fastrt64x10"}
CELLS = (("20", "beta 0.2, N=5"), ("30", "beta 0.3, N=5"))


def main():
    fig, axes = plt.subplots(1, 2, figsize=(13, 4.5), sharey=True)
    for ax, (noise, title) in zip(axes, CELLS):
        path = os.path.join(HERE, "stats_cert", "beta_noise",
                            f"noise_{noise}", "ts_50",
                            "5_samples_6_obs.npz")
        with np.load(path) as z:
            n_mc = int(z["n_mc"])
            data = [z[f"coll_{a}"] / n_mc * 100.0 for a in ARMS]
        try:
            bp = ax.boxplot(data, tick_labels=ARMS, showmeans=True,
                            showfliers=False, widths=0.7)
        except TypeError:   # matplotlib < 3.9 spells the kwarg "labels"
            bp = ax.boxplot(data, labels=ARMS, showmeans=True,
                            showfliers=False, widths=0.7)
        for lbl in ax.get_xticklabels():
            if lbl.get_text() in PROMOTED:
                lbl.set_fontweight("bold")
            lbl.set_rotation(20)
        for i, d in enumerate(data):
            ax.annotate(f"{np.mean(d):.1f}", (i + 1, np.mean(d)),
                        textcoords="offset points", xytext=(14, 2),
                        fontsize=8, color="tab:green")
        ax.set_title(f"{title} (n={len(data[0])} joined)")
        ax.grid(True, alpha=0.3)
    axes[0].set_ylabel("MC collision % per accepted solve")
    fig.suptitle("Fast-budget certification: default vs fast arms vs cvar"
                 " (1000-rollout MC, paired scenario join)")
    fig.tight_layout()
    out = os.path.join(HERE, "box_cert.png")
    fig.savefig(out, dpi=150)
    print(out)


if __name__ == "__main__":
    main()
