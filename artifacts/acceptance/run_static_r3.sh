#!/bin/bash
# Round-3 static acceptance evidence (VERDICT r2 item 2 + 3): re-run the
# four round-2 static cells AND the discrimination-extension cells with
# the current code, validate with the paired pipeline (Wilcoxon +
# bootstrap CI now included), and keep EVERYTHING in git:
# data_static/ (sweep stores), stats_static/ (paired npz + sidecars),
# box_grid_{gaussian,beta}_r3.png.
#
# Cells (200 configs each, mmd_opt + cvar, ts_50, 6 obs):
#   gaussian 0.1/0.2 x N={5,10}   (r2 cells + N=5 gaussian extension)
#   beta 0.1/0.2/0.3 x N=10, beta 0.1 x N=5, beta 0.3 x N=15
# (beta 0.2/0.3 x N=5 come from artifacts/realtime/ — same protocol, same
# code, default-budget mmd_opt and cvar stores are reused for the grid.)
set -ex
cd "$(dirname "$0")/../.."
OUT=artifacts/acceptance/data_static
STATS=artifacts/acceptance/stats_static
MET=artifacts/acceptance/sweep_metrics_r3.jsonl

sweep() {  # sweep <noise> <levels...> -- <reduced...>
  python -m mpc_mmd_tpu.cli.sweep --workload static --costs mmd_opt cvar \
    --noise_levels $2 --num_reduced_sets $3 --num_obs 6 --num_prime 50 \
    --noises $1 --num_configs 200 --out $OUT --metrics $MET
}

compare() {  # compare <noise> <lvl_pct> <reduced>
  D=$OUT/static/$1_noise/noise_$2/ts_50
  python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
    --data $D/mmd_opt_$3_samples_6_obs $D/cvar_$3_samples_6_obs \
    --out $STATS | tail -40
}

for lvl in 0.1 0.2; do
  for N in 5 10; do
    sweep gaussian $lvl $N
  done
done
for lvl in 0.1 0.2 0.3; do
  sweep beta $lvl 10
done
sweep beta 0.1 5
sweep beta 0.3 15

for p in 10 20; do
  for N in 5 10; do compare gaussian $p $N; done
done
for p in 10 20 30; do compare beta $p 10; done
compare beta 10 5
compare beta 30 15

# beta 0.2/0.3 N=5: reuse the realtime-cert default-budget stores
for p in 20 30; do
  D=artifacts/realtime/data/static/beta_noise/noise_$p/ts_50
  python -m mpc_mmd_tpu.cli.validate --compare --n_mc 1000 \
    --data $D/mmd_opt_5_samples_6_obs $D/cvar_5_samples_6_obs \
    --out $STATS | tail -40
done

python -m mpc_mmd_tpu.cli.report grid --stats_root $STATS \
  --noise gaussian --noise_levels 0.1 0.2 --num_reduced_sets 5 10 \
  --num_obs 6 --num_prime 50 \
  --out artifacts/acceptance/box_grid_gaussian_r3.png
python -m mpc_mmd_tpu.cli.report grid --stats_root $STATS \
  --noise beta --noise_levels 0.1 0.2 0.3 --num_reduced_sets 5 10 15 \
  --num_obs 6 --num_prime 50 \
  --out artifacts/acceptance/box_grid_beta_r3.png
