#!/bin/bash
# Third round-5 extension: the two static beta cells 600 -> 1200 configs
# for the three round-5 cert arms, validated as a 3-arm join into
# stats_cert_r5/ (the committed 7-arm 600-config joins in stats_cert/
# stay untouched — summarize.py/pooled.json still reproduce).  After
# this, every cell in pooled_r5.json is the same protocol: 3 arms
# (default, fastrt64x10, cvar), 1200 configs, 1000-MC paired validation.
set -x
cd "$(dirname "$0")/../.."

for LVL in 0.2 0.3; do
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 1200 --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 1200 --outer_budget 64x10 \
    --inner_budget 64x12 --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs cvar \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 1200 --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl

  N=$(python -c "print(round($LVL*100))")
  D=artifacts/fast/data/static/beta_noise/noise_$N/ts_50
  python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
    --data $D/mmd_opt_5_samples_6_obs \
           $D/mmd_opt_S64x12_B64x10_5_samples_6_obs \
           $D/cvar_5_samples_6_obs \
    --labels mmd_opt fastrt64x10 cvar \
    --out artifacts/fast/stats_cert_r5 \
    | tee artifacts/fast/cert_r5_beta${N}_N5.json
done

python artifacts/fast/summarize_r5.py | tee artifacts/fast/pooled_r5.json
