"""Apply symmetric + asymmetric acceptance rules to the accept-all
flagship-cell sweep (see run.sh) and print one JSON summary.

Inputs: the paired stats npz written by validate --compare (coll_{label},
idx_{label} row maps) and the two accept-all ResultStores (risk_obs per
solve).  Rules:

  ALL — no filter.  Paired Wilcoxon + bootstrap CI over every common
        scenario: the fully symmetric comparison.
  REF — the reference's asymmetric thresholds re-derived from risk_obs
        (main_mpc.py:86-97: mmd accepts risk <= -ker_wt+1, cvar accepts
        risk <= 1e-5), then intersected — reproduces the original
        protocol inside this control.
  MC  — a common MC-validated safety cutoff: a solve is "validated safe"
        when its own 1000-rollout validation shows <= K collisions
        (K = 0 and 10).  Reported as paired acceptance rates with an
        exact McNemar test on the discordant pairs; collision stats
        conditioned on a collision cutoff would be circular, so none
        are reported under this rule.
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "..", ".."))

from mpc_mmd_tpu.cli.validate import paired_stats          # noqa: E402
from mpc_mmd_tpu.utils.io_store import ResultStore         # noqa: E402

STATS = os.path.join(HERE, "stats", "beta_noise", "noise_30", "ts_50",
                     "5_samples_6_obs.npz")
DATA = os.path.join(HERE, "data", "static", "beta_noise", "noise_30",
                    "ts_50")


def mcnemar_exact(acc_a: np.ndarray, acc_b: np.ndarray) -> dict:
    """Exact two-sided McNemar on paired accept/reject outcomes."""
    from scipy.stats import binomtest
    b = int(np.sum(acc_a & ~acc_b))
    c = int(np.sum(~acc_a & acc_b))
    p = binomtest(b, b + c, 0.5).pvalue if b + c else 1.0
    return {"a_only": b, "b_only": c, "both": int(np.sum(acc_a & acc_b)),
            "neither": int(np.sum(~acc_a & ~acc_b)), "p_mcnemar": float(p)}


def main():
    with np.load(STATS) as z:
        coll_m = z["coll_mmd_opt"]
        coll_c = z["coll_cvar"]
        idx_m = z["idx_mmd_opt"]
        idx_c = z["idx_cvar"]
        n_mc = int(z["n_mc"])
    risk_m = ResultStore(os.path.join(
        DATA, "mmd_opt_all_5_samples_6_obs")).concatenated()["risk_obs"]
    risk_c = ResultStore(os.path.join(
        DATA, "cvar_all_5_samples_6_obs")).concatenated()["risk_obs"]
    # per joined scenario: each mode's own risk estimate for its solve
    rm = risk_m[idx_m]
    rc = risk_c[idx_c]

    out = {"n_total": int(len(coll_m)), "n_mc": n_mc}

    # --- rule ALL: fully symmetric, no filter ---------------------------
    out["rule_all"] = paired_stats(coll_m, coll_c)
    out["rule_all"]["mean_pct"] = {
        "mmd_opt": float(np.mean(coll_m) / n_mc * 100),
        "cvar": float(np.mean(coll_c) / n_mc * 100)}

    # --- rule REF: the reference's asymmetric thresholds ----------------
    ker_wt = 1000.0
    acc_m = rm <= (-ker_wt + 1.0)
    acc_c = rc <= 1.0e-5
    both = acc_m & acc_c
    out["rule_ref"] = {
        "accepted_mmd": int(acc_m.sum()), "accepted_cvar": int(acc_c.sum()),
        "n_joint": int(both.sum()),
        **paired_stats(coll_m[both], coll_c[both])}
    out["rule_ref"]["mean_pct"] = {
        "mmd_opt": float(np.mean(coll_m[both]) / n_mc * 100),
        "cvar": float(np.mean(coll_c[both]) / n_mc * 100)}

    # --- rule MC: common validated-safety cutoff (paired rates) ---------
    out["rule_mc"] = {}
    for K in (0, 10):
        safe_m = coll_m <= K
        safe_c = coll_c <= K
        out["rule_mc"][f"cutoff_{K}"] = {
            "safe_rate_mmd": float(np.mean(safe_m)),
            "safe_rate_cvar": float(np.mean(safe_c)),
            **mcnemar_exact(safe_m, safe_c)}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
