"""Build the round-3 static acceptance table from stats_static sidecars.

Reads every ``stats_static/*_noise/noise_*/ts_50/*_samples_*_obs.json``
paired-validation sidecar (written by ``cli.validate --compare``, which
includes Wilcoxon signed-rank + bootstrap-CI paired significance for
mmd_opt vs cvar) and prints the SUMMARY.md markdown table.

    python artifacts/acceptance/summarize_r3.py
"""

import glob
import json
import os
import re


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for path in sorted(glob.glob(os.path.join(
            here, "stats_static", "*_noise", "noise_*", "ts_*",
            "*_samples_*_obs.json"))):
        m = re.search(r"(\w+)_noise/noise_(\d+)/ts_(\d+)/(\d+)_samples_"
                      r"(\d+)_obs", path)
        noise, pct, ts, n_red, n_obs = m.groups()
        d = json.load(open(path))
        mmd = d["modes"]["mmd_opt"]
        cvar = d["modes"]["cvar"]
        pair = d["pairs"].get("mmd_opt_vs_cvar") or d["pairs"].get(
            "cvar_vs_mmd_opt")
        rows.append((noise, int(pct), int(n_red), d["n_common"], mmd, cvar,
                     pair, d["n_mc"]))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    print("| cell | n | mmd_opt mean / p50 | cvar mean / p50 | "
          "mean diff [CI95] | p (Wilcoxon) |")
    print("|---|---|---|---|---|---|")
    for noise, pct, n_red, n, mmd, cvar, pair, n_mc in rows:
        s = 100.0 / n_mc  # collision counts -> percent
        lo, hi = pair["mean_diff_ci95"]
        sig = " **\\***" if pair["significant_05"] else ""
        print(f"| {noise} {pct/100:.1f}, N={n_red} | {n} "
              f"| {mmd['coll_pct_mean']:.2f} / {mmd['coll_pct_p50']:.2f} "
              f"| {cvar['coll_pct_mean']:.2f} / {cvar['coll_pct_p50']:.2f} "
              f"| {pair['mean_diff']*s:+.2f}% [{lo*s:+.2f}, {hi*s:+.2f}] "
              f"| {pair['p_wilcoxon']:.3f}{sig} |")
    print("\nmean diff = mean(mmd_opt - cvar) collision %, negative favors "
          "MMD; * = p<0.05.")


if __name__ == "__main__":
    main()
