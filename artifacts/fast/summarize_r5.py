"""Round-5 broadened certification summary (VERDICT r4 item 1).

The round-4 fastrt64x10 certification covered two static beta cells;
run_cert_r5.sh adds a gaussian static cell (0.1, N=5) and a
dynamic-workload cell (beta 0.3, N=5, cut-in).  This summarizer reports
the promoted arm vs the default budget per cell (positive diff = fastrt
worse, in MC collision percentage points), vs cvar per cell, the 4-cell
pooled fastrt-vs-default estimate, and the certification-bar verdict per
cell (CI95 upper bound < 2.5 pp regression).  Writes to stdout
(tee'd into pooled_r5.json by the caller).
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

from mpc_mmd_tpu.cli.validate import paired_stats          # noqa: E402

# Beta cells: prefer the uniform-protocol 3-arm 1200-config joins
# (stats_cert_r5/, run_cert_r5_ext3.sh) over the round-4 7-arm
# 600-config joins (stats_cert/ — kept for pooled.json reproduction);
# fall back to the 7-arm stats when the extension has not run.
import os as _os
_H = _os.path.dirname(_os.path.abspath(__file__))


def _beta(noise):
    r5 = f"stats_cert_r5/beta_noise/noise_{noise}/ts_50/5_samples_6_obs.npz"
    if _os.path.exists(_os.path.join(_H, r5)):
        return r5
    return f"stats_cert/beta_noise/noise_{noise}/ts_50/5_samples_6_obs.npz"


CELLS = (
    ("static-beta0.2", _beta(20)),
    ("static-beta0.3", _beta(30)),
    ("static-gauss0.1", "stats_cert/gaussian_noise/noise_10/ts_50/5_samples_6_obs.npz"),
    ("dynamic-beta0.3", "stats_cert_dyn/beta_noise/noise_30/ts_50/5_samples_6_obs.npz"),
)
ARM = "fastrt64x10"
BASE = "mmd_opt"


def _pct(s, n_mc):
    s = dict(s)
    s["mean_diff_pct"] = s["mean_diff"] / n_mc * 100
    s["mean_diff_ci95_pct"] = [v / n_mc * 100 for v in s["mean_diff_ci95"]]
    return s


def main():
    out = {"cells": {}, "pooled": {}}
    base_all, arm_all = [], []
    n_mc = 1000
    for name, rel in CELLS:
        path = os.path.join(HERE, rel)
        if not os.path.exists(path):
            out["cells"][name] = "MISSING"
            continue
        with np.load(path) as z:
            n_mc = int(z["n_mc"])
            if f"coll_{ARM}" not in z:
                out["cells"][name] = "no fastrt arm"
                continue
            base = z[f"coll_{BASE}"]
            arm = z[f"coll_{ARM}"]
            cell = {"n_mc": n_mc,
                    "mean_pct": {BASE: float(np.mean(base)) / n_mc * 100,
                                 ARM: float(np.mean(arm)) / n_mc * 100}}
            s = _pct(paired_stats(arm, base), n_mc)
            s["regression_over_2p5pct_excluded"] = bool(
                s["mean_diff_ci95_pct"][1] < 2.5)
            cell[f"{ARM}_minus_default"] = s
            if "coll_cvar" in z:
                cv = z["coll_cvar"]
                cell["mean_pct"]["cvar"] = float(np.mean(cv)) / n_mc * 100
                cell[f"{ARM}_minus_cvar"] = _pct(paired_stats(arm, cv), n_mc)
            out["cells"][name] = cell
            base_all.append(base)
            arm_all.append(arm)
    if base_all:
        base = np.concatenate(base_all)
        arm = np.concatenate(arm_all)
        s = _pct(paired_stats(arm, base), n_mc)
        s["regression_over_2p5pct_excluded"] = bool(
            s["mean_diff_ci95_pct"][1] < 2.5)
        out["pooled"][f"{ARM}_minus_default_4cells"] = s
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
