#!/bin/bash
# Round-5 extension: the gaussian cell joined only n=97 of 600 configs
# (gaussian 0.1 acceptance is ~25% per arm), leaving its favorable sign
# at p=0.12.  Extend all three arms 600 -> 1200 configs (stores RESUME:
# only configs 600-1199 solve) and re-validate; summarize_r5.py then
# re-pools all four cells.
set -x
cd "$(dirname "$0")/../.."

for ARGS in "" "--outer_budget 64x10 --inner_budget 64x12"; do
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt \
    --noise_levels 0.1 --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
    --noises gaussian --num_configs 1200 $ARGS \
    --out artifacts/fast/data --metrics artifacts/fast/sweep_metrics.jsonl
done
python -m mpc_mmd_tpu.cli.sweep --workload static --costs cvar \
  --noise_levels 0.1 --num_reduced_sets 5 --num_obs 6 --num_prime 50 \
  --noises gaussian --num_configs 1200 --out artifacts/fast/data \
  --metrics artifacts/fast/sweep_metrics.jsonl

D=artifacts/fast/data/static/gaussian_noise/noise_10/ts_50
python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
  --data $D/mmd_opt_5_samples_6_obs \
         $D/mmd_opt_S64x12_B64x10_5_samples_6_obs \
         $D/cvar_5_samples_6_obs \
  --labels mmd_opt fastrt64x10 cvar \
  --out artifacts/fast/stats_cert \
  | tee artifacts/fast/cert_gauss10_N5.json

python artifacts/fast/summarize_r5.py | tee artifacts/fast/pooled_r5.json
