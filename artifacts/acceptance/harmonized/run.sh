#!/bin/bash
# Harmonized-acceptance control for the MMD-vs-CVaR comparison
# (VERDICT r3 item 3).  The reference's acceptance thresholds are
# asymmetric (main_mpc.py:86-97: cvar keeps only solves with <=1e-5
# predicted violation — certified-safe-by-its-own-estimate — while mmd's
# -ker_wt+1 admits any converged solve), so "CVaR favored, p=0.009" on the
# intersection may partly measure the FILTERS.  This control re-sweeps the
# flagship cell (beta 0.3, N=5, 600 configs — the high-power shape from
# data_static_power/) with --accept_all, persisting EVERY solve with its
# risk_obs, then summarize.py applies three acceptance rules to the SAME
# paired MC validation:
#   ALL  — accept every solve (fully symmetric, no filter)
#   REF  — re-derive the reference's asymmetric thresholds from risk_obs
#          (reproduces the original protocol inside this control)
#   MC   — a common MC-validated safety cutoff (validator collision
#          count == 0 / <= 10 of 1000), compared as paired acceptance
#          rates (McNemar) since conditioning collision stats on a
#          collision cutoff is circular.
set -ex
cd "$(dirname "$0")/../../.."

for MODE in mmd_opt cvar; do
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs $MODE \
    --noise_levels 0.3 --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 600 --accept_all \
    --out artifacts/acceptance/harmonized/data \
    --metrics artifacts/acceptance/harmonized/sweep_metrics.jsonl
done

D=artifacts/acceptance/harmonized/data/static/beta_noise/noise_30/ts_50
python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
  --data $D/mmd_opt_all_5_samples_6_obs $D/cvar_all_5_samples_6_obs \
  --labels mmd_opt cvar \
  --out artifacts/acceptance/harmonized/stats \
  | tee artifacts/acceptance/harmonized/validate_out.json

python artifacts/acceptance/harmonized/summarize.py \
  | tee artifacts/acceptance/harmonized/rules.json
