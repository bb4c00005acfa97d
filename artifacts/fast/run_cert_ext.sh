#!/bin/bash
# Extension of run_cert.sh: 200 -> 600 configs per arm (the sweeps RESUME —
# static_grid seeds per config and the store skips completed chunks, so
# only configs 200-599 solve), plus a COMBINED arm stacking the fast outer
# budget (64x12) on the certified realtime inner budget (64x12).  Pooled
# n across the two cells then reaches the CI precision the 200-config
# cells lack (cell-1 CI95 on the fast64x12 regression spanned +/-4 pp).
set -ex
cd "$(dirname "$0")/../.."

for LVL in 0.2 0.3; do
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 600 --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 600 --outer_budget 64x14 \
    --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 600 --outer_budget 64x12 \
    --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 600 --outer_budget 64x12 \
    --inner_budget 64x12 --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs cvar \
    --noise_levels $LVL --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises beta --num_configs 600 --out artifacts/fast/data \
    --metrics artifacts/fast/sweep_metrics.jsonl

  N=$(python -c "print(round($LVL*100))")
  D=artifacts/fast/data/static/beta_noise/noise_$N/ts_50
  python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
    --data $D/mmd_opt_5_samples_6_obs \
           $D/mmd_opt_B64x14_5_samples_6_obs \
           $D/mmd_opt_B64x12_5_samples_6_obs \
           $D/mmd_opt_S64x12_B64x12_5_samples_6_obs \
           $D/cvar_5_samples_6_obs \
    --labels mmd_opt fast64x14 fast64x12 fastrt64x12 cvar \
    --out artifacts/fast/stats_cert \
    | tee artifacts/fast/cert_beta${N}_N5.json
done

python artifacts/fast/summarize.py | tee artifacts/fast/pooled.json
