#!/bin/bash
# Second round-5 extension: the dynamic cell 600 -> 1200 configs (its
# favorable sign was the most marginal, p=0.046 at n=352).  Stores
# resume; re-validate joins the three arms on the doubled config set and
# summarize_r5.py re-pools.
set -x
cd "$(dirname "$0")/../.."

python -m mpc_mmd_tpu.cli.sweep --workload dynamic --costs mmd_opt \
  --noise_levels 0.3 --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
  --noises beta --num_configs 1200 --out artifacts/fast/data \
  --metrics artifacts/fast/sweep_metrics.jsonl
python -m mpc_mmd_tpu.cli.sweep --workload dynamic --costs mmd_opt \
  --noise_levels 0.3 --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
  --noises beta --num_configs 1200 --outer_budget 64x10 \
  --inner_budget 64x12 --out artifacts/fast/data \
  --metrics artifacts/fast/sweep_metrics.jsonl
python -m mpc_mmd_tpu.cli.sweep --workload dynamic --costs cvar \
  --noise_levels 0.3 --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
  --noises beta --num_configs 1200 --out artifacts/fast/data \
  --metrics artifacts/fast/sweep_metrics.jsonl

DD=artifacts/fast/data/dynamic/beta_noise/noise_30/ts_50
python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
  --data $DD/mmd_opt_5_samples_6_obs \
         $DD/mmd_opt_S64x12_B64x10_5_samples_6_obs \
         $DD/cvar_5_samples_6_obs \
  --labels mmd_opt fastrt64x10 cvar \
  --out artifacts/fast/stats_cert_dyn \
  | tee artifacts/fast/cert_dyn_beta30_N5.json

python artifacts/fast/summarize_r5.py | tee artifacts/fast/pooled_r5.json
