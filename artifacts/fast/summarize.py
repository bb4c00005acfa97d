"""Pooled paired stats for the fast-preset certification (run_cert.sh).

Reads the per-cell stats npzs (beta 0.2 / 0.3, N=5) and pools the
per-scenario collision-count differences across cells for each fast arm
vs the default budget — the same pooled-n standard the realtime cert used
(artifacts/realtime/, pooled n=99).  Prints one JSON summary with per-cell
and pooled Wilcoxon + bootstrap CI, in percentage points of MC collision
rate (counts / n_mc * 100).
"""

import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

from mpc_mmd_tpu.cli.validate import paired_stats          # noqa: E402

ARMS = ("fast64x14", "fast64x12", "fast64x10", "fastrt64x12", "fastrt64x10")
BASELINE_ARM = "mmd_opt"


def main():
    cells = {}
    pooled = {arm: ([], []) for arm in ARMS}      # (default, fast) counts
    for path in sorted(glob.glob(os.path.join(
            HERE, "stats_cert", "beta_noise", "noise_*", "ts_50",
            "*_samples_*_obs.npz"))):
        cell = path.split("noise_")[-1].split(os.sep)[0]
        with np.load(path) as z:
            n_mc = int(z["n_mc"])
            base = z[f"coll_{BASELINE_ARM}"]
            cells[f"beta0.{cell[:-1] if cell.endswith('0') else cell}"] = {
                arm: paired_stats(z[f"coll_{arm}"], base)
                for arm in ARMS if f"coll_{arm}" in z}
            for arm in ARMS:
                if f"coll_{arm}" in z:
                    pooled[arm][0].append(base)
                    pooled[arm][1].append(z[f"coll_{arm}"])
    out = {"cells": cells, "n_mc": n_mc, "pooled": {}}
    for arm in ARMS:
        if not pooled[arm][0]:
            continue
        base = np.concatenate(pooled[arm][0])
        fast = np.concatenate(pooled[arm][1])
        s = paired_stats(fast, base)             # positive diff = fast worse
        s["mean_diff_pct"] = s["mean_diff"] / n_mc * 100
        s["mean_diff_ci95_pct"] = [v / n_mc * 100
                                   for v in s["mean_diff_ci95"]]
        s["regression_over_2p5pct_excluded"] = bool(
            s["mean_diff_ci95_pct"][1] < 2.5)
        out["pooled"][f"{arm}_minus_default"] = s
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
