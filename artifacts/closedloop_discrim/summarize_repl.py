"""Pre-registered replication analysis (round 5): beta-noise clearance.

Reads the round-4 matrix arms (matrix_beta_{mmd_opt,cvar}.json, seeds
0-19) and the replication arms (repl_beta_{mmd_opt,cvar}.json, seeds
100-119) and prints, per the pre-registration in SUMMARY.md:

1. Replication-only primary endpoint: paired Wilcoxon on per-episode
   minimum safety-ellipse margin, mmd_opt vs cvar (two-sided), with the
   retain/remove decision (retained iff mean diff > 0 AND p < 0.05).
2. Replication-only secondary endpoint: exact McNemar on collisions.
3. The combined 40-episode estimates for both endpoints.
"""

import json
import os

import numpy as np
from scipy.stats import binom, wilcoxon

HERE = os.path.dirname(os.path.abspath(__file__))


def load(path):
    eps = [json.loads(l) for l in open(os.path.join(HERE, path))
           if l.strip()]
    return {e["episode"]: e for e in eps if "episode" in e}


def mcnemar_exact(a, b):
    d10 = int(np.sum(a & ~b))
    d01 = int(np.sum(~a & b))
    n = d10 + d01
    p = 1.0 if n == 0 else min(2.0 * binom.cdf(min(d10, d01), n, 0.5), 1.0)
    return p, d10, d01


def block(tag, m, c):
    eps = sorted(set(m) & set(c))
    marg_m = np.array([m[e]["min_margin"] for e in eps])
    marg_c = np.array([c[e]["min_margin"] for e in eps])
    coll_m = np.array([m[e]["collided"] for e in eps])
    coll_c = np.array([c[e]["collided"] for e in eps])
    d = marg_m - marg_c
    p_w = float(wilcoxon(marg_m, marg_c).pvalue) if np.any(d) else 1.0
    p_mc, d10, d01 = mcnemar_exact(coll_m, coll_c)
    print(f"[{tag}] n={len(eps)} paired episodes")
    print(f"  margins: mmd_opt mean {marg_m.mean():+.3f} / cvar "
          f"{marg_c.mean():+.3f}; diff mean {d.mean():+.3f} median "
          f"{np.median(d):+.3f}; Wilcoxon two-sided p={p_w:.4f}")
    print(f"  collisions: mmd_opt {int(coll_m.sum())}/{len(eps)}, cvar "
          f"{int(coll_c.sum())}/{len(eps)}; McNemar p={p_mc:.4f} "
          f"(mmd-only={d10}, cvar-only={d01})")
    return d.mean(), p_w


def main():
    m4, c4 = load("matrix_beta_mmd_opt.json"), load("matrix_beta_cvar.json")
    mr, cr = load("repl_beta_mmd_opt.json"), load("repl_beta_cvar.json")
    block("round-4 original, seeds 0-19", m4, c4)
    mean_d, p = block("REPLICATION, seeds 100-119", mr, cr)
    retained = mean_d > 0 and p < 0.05
    print(f"pre-registered decision: claim "
          f"{'RETAINED' if retained else 'REMOVED'} "
          f"(mean diff {mean_d:+.3f}, p={p:.4f}; rule: positive AND "
          f"p<0.05)")
    block("COMBINED 40 episodes", {**m4, **mr}, {**c4, **cr})


if __name__ == "__main__":
    main()
