#!/bin/bash
# Round-5: the closed-loop discrimination matrices re-run at the PROMOTED
# combined budget (config.fastrt_workload: outer 64x10 + inner 64x12) —
# VERDICT r4 next-round item 1 third regime.  Round 4 only ran the
# realtime INNER budget (matrix_mmd_rt.json); this runs the full fastrt
# budget on both matrix families, paired (same seeds 0-19) against the
# committed default-budget arms:
#   gaussian regime (run_matrix.sh):      matrix_mmd_fastrt.json
#   beta compensated regime (run_matrix_beta.sh, MATRIX_VDES=25):
#                                          matrix_beta_mmd_fastrt.json
set -x
cd "$(dirname "$0")/../.."
OUT=artifacts/closedloop_discrim
BUDGET="--outer_budget 64x10 --inner_budget 64x12"

COMMON_G="--episodes 20 --route curved --num_reduced 4 --num_obs 4 \
  --num_prime 50 --max_steps 150 --goal_arc 200 \
  --noise gaussian --noise_level 0.3 --obstacles 60:0 140:0.2"
timeout 6000 python -m mpc_mmd_tpu.cli.closedloop --mode mmd_opt \
  $BUDGET $COMMON_G \
  > $OUT/matrix_mmd_fastrt.json 2> $OUT/matrix_mmd_fastrt.err
tail -1 $OUT/matrix_mmd_fastrt.json

COMMON_B="--episodes 20 --route curved --num_reduced 4 --num_obs 4 \
  --num_prime 50 --max_steps 300 --goal_arc 120 --v_des 25 \
  --noise beta --noise_level 0.3 --obstacles 40:0 90:0.2"
timeout 6000 python -m mpc_mmd_tpu.cli.closedloop --mode mmd_opt \
  $BUDGET $COMMON_B \
  > $OUT/matrix_beta_mmd_fastrt.json 2> $OUT/matrix_beta_mmd_fastrt.err
tail -1 $OUT/matrix_beta_mmd_fastrt.json

python $OUT/summarize.py "matrix_*.json"
python $OUT/summarize.py "matrix_beta_*.json"
