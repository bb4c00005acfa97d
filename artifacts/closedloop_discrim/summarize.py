"""Summarize the closed-loop discrimination matrix.

Reads matrix_{mode}.json (per-episode JSONL, seeds = episode index shared
across modes -> paired binary outcomes) and prints a collision-rate table
plus exact McNemar tests (the correct paired test for binary outcomes)
for mmd_opt vs each baseline.

    python artifacts/closedloop_discrim/summarize.py [glob]

The optional glob (default "matrix_*.json") selects the matrix family —
e.g. "matrix_beta_*.json" for the beta-noise matrix, which would
otherwise be mixed in with the gaussian one.
"""

import glob
import json
import os
import sys

import numpy as np
from scipy.stats import binom


def load(path):
    eps = [json.loads(l) for l in open(path) if l.strip()]
    eps = [e for e in eps if "episode" in e]
    return {e["episode"]: e for e in eps}


def mcnemar_exact(a, b):
    """Two-sided exact McNemar p-value for paired binary outcomes."""
    d10 = int(np.sum(a & ~b))
    d01 = int(np.sum(~a & b))
    n = d10 + d01
    if n == 0:
        return 1.0, d10, d01
    p = 2.0 * binom.cdf(min(d10, d01), n, 0.5)
    return min(p, 1.0), d10, d01


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    pattern = sys.argv[1] if len(sys.argv) > 1 else "matrix_*.json"
    prefix = pattern.split("*")[0]
    runs = {}
    for path in sorted(glob.glob(os.path.join(here, pattern))):
        name = os.path.basename(path)[len(prefix):-len(".json")]
        # keep the two matrix families apart under the default glob
        if prefix == "matrix_" and name.startswith("beta_"):
            continue
        eps = load(path)
        if eps:
            runs[name] = eps
    if not runs:
        print("no matrix files")
        return
    common = sorted(set.intersection(*(set(v) for v in runs.values())))
    print(f"modes: {sorted(runs)}  paired episodes: {len(common)}")
    coll = {m: np.array([runs[m][e]["collided"] for e in common])
            for m in runs}
    margin = {m: np.array([runs[m][e]["min_margin"] for e in common])
              for m in runs}
    for m in sorted(runs):
        lat = [runs[m][e]["mean_solve_ms"] for e in common]
        print(f"{m:10s} collisions {int(coll[m].sum()):2d}/{len(common)}"
              f"  median min_margin {np.median(margin[m]):+.3f}"
              f"  mean solve {np.mean(lat):.0f} ms")
    # ALL mode pairs, mmd_opt-first when present (ADVICE r4: SUMMARY cites
    # cvar-vs-det numbers, so every cited pair must be reproducible here)
    import itertools
    ref = "mmd_opt" if "mmd_opt" in runs else sorted(runs)[0]
    order = [ref] + sorted(m for m in runs if m != ref)
    pairs = list(itertools.combinations(order, 2))
    for a, b in pairs:
        p, d10, d01 = mcnemar_exact(coll[a], coll[b])
        print(f"McNemar {a} vs {b}: {a}-only={d10} {b}-only={d01} "
              f"p={p:.4f}")
    # secondary continuous endpoint: paired min safety-ellipse margins
    # (collisions can be null at n=20 while clearance behavior differs —
    # the beta matrix found exactly that, see SUMMARY.md round-4 section)
    from scipy.stats import wilcoxon
    for a, b in pairs:
        d = margin[a] - margin[b]
        try:
            p = float(wilcoxon(margin[a], margin[b]).pvalue)
        except ValueError:          # all-zero differences
            p = 1.0
        print(f"Wilcoxon min_margin {a} vs {b}: mean diff {d.mean():+.3f}"
              f" median {np.median(d):+.3f} p={p:.4f}")


if __name__ == "__main__":
    main()
