#!/bin/bash
# Round-5 TPU queue #2 (runs after r5_queue.sh): profiling at the promoted
# operating point + per-chip throughput re-measure (VERDICT r4 item 3) and
# a kernel-variant production cell (gaussian + matern52 arms vs laplace,
# 200 configs, proving the RiskConfig.kernel plumbing on real hardware).
cd "$(dirname "$0")/.."
set -x
date
PROFILE_PRESET=fastrt timeout 3000 python benchmarks/profile_stages_r2.py \
  > benchmarks/profile_fastrt_stages.log 2>&1
date
bash benchmarks/fastrt_throughput_sweep.sh \
  > benchmarks/fastrt_throughput_sweep.log 2>&1
date
# kernel ablation cell: flagship shape (beta 0.3, N=5), 200 configs/arm
for K in gaussian matern52; do
  timeout 6000 python -m mpc_mmd_tpu.cli.sweep --workload static \
    --costs mmd_opt --noise_levels 0.3 --num_reduced_sets 5 --num_obs 6 \
    --num_prime 50 --noises beta --num_configs 200 --kernel $K \
    --out artifacts/fast/data --metrics artifacts/fast/sweep_metrics.jsonl
done
D=artifacts/fast/data/static/beta_noise/noise_30/ts_50
timeout 6000 python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
  --data $D/mmd_opt_5_samples_6_obs \
         $D/mmd_opt_Kgaussian_5_samples_6_obs \
         $D/mmd_opt_Kmatern52_5_samples_6_obs \
         $D/cvar_5_samples_6_obs \
  --labels mmd_opt gaussian matern52 cvar \
  --out artifacts/fast/stats_kernels \
  | tee artifacts/fast/cert_kernels_beta30_N5.json
date
echo R5_QUEUE2_DONE
