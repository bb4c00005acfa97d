"""Regenerate box_cert_r5.png: the round-5 broadened certification —
per-cell MC collision-% box plots for the promoted fastrt64x10 arm vs the
default budget and cvar, across all four certified cells (static beta
0.2/0.3, static gaussian 0.1, dynamic beta 0.3 cut-in).

Reads the compare-format stats npzs written by `cli.validate --compare`
(run_cert_r5.sh); means annotated; the promoted arm bolded.
"""

import os

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
ARMS = ("mmd_opt", "fastrt64x10", "cvar")
PROMOTED = {"fastrt64x10"}
CELLS = (
    ("static beta 0.2, N=5",
     "stats_cert_r5/beta_noise/noise_20/ts_50/5_samples_6_obs.npz"),
    ("static beta 0.3, N=5",
     "stats_cert_r5/beta_noise/noise_30/ts_50/5_samples_6_obs.npz"),
    ("static gauss 0.1, N=5",
     "stats_cert/gaussian_noise/noise_10/ts_50/5_samples_6_obs.npz"),
    ("dynamic beta 0.3, N=5",
     "stats_cert_dyn/beta_noise/noise_30/ts_50/5_samples_6_obs.npz"),
)


def main():
    fig, axes = plt.subplots(1, 4, figsize=(16, 4.2), sharey=False)
    for ax, (title, rel) in zip(axes, CELLS):
        with np.load(os.path.join(HERE, rel)) as z:
            n_mc = int(z["n_mc"])
            data = [z[f"coll_{a}"] / n_mc * 100.0 for a in ARMS]
        try:
            ax.boxplot(data, tick_labels=ARMS, showmeans=True,
                       showfliers=False, widths=0.6)
        except TypeError:   # matplotlib < 3.9 spells the kwarg "labels"
            ax.boxplot(data, labels=ARMS, showmeans=True,
                       showfliers=False, widths=0.6)
        for lbl in ax.get_xticklabels():
            if lbl.get_text() in PROMOTED:
                lbl.set_fontweight("bold")
            lbl.set_rotation(15)
        for i, d in enumerate(data):
            ax.annotate(f"{np.mean(d):.1f}", (i + 1, np.mean(d)),
                        textcoords="offset points", xytext=(12, 2),
                        fontsize=8)
        ax.set_title(f"{title}  (n={len(data[0])})", fontsize=10)
        ax.grid(axis="y", alpha=0.3)
    axes[0].set_ylabel("MC collision rate (%) per scenario")
    fig.suptitle("fastrt64x10 certification, round 5: all four cells "
                 "(1000-MC paired validation, intersection-joined)",
                 fontsize=11)
    fig.tight_layout()
    out = os.path.join(HERE, "box_cert_r5.png")
    fig.savefig(out, dpi=140)
    print(out)


if __name__ == "__main__":
    main()
