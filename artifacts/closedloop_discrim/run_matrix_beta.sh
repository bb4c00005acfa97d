#!/bin/bash
# Beta-noise closed-loop matrix (VERDICT r3 item 4, phase 2).  The round-3
# probe showed the beta noise model's deceleration bias (mean ~ -0.43σ|u|)
# stalls approach within a 150-step cap; search_beta.sh compensated on the
# three verdict axes (shorter arcs 40/90, higher v_des, cap 300) and found
# det contact: v_des=20 -> 3/10 collisions (see search_det_beta_*.json).
# This runs the 20-seeded-episode matrix on the discriminating regime —
# same protocol as the gaussian matrix (run_matrix.sh): seeds = episode
# index, identical across modes (paired scenarios), default solver budgets
# for comparability with the round-3 matrix.
set -x
cd "$(dirname "$0")/../.."
OUT=artifacts/closedloop_discrim
VDES=${MATRIX_VDES:-20}
COMMON="--episodes 20 --route curved --num_reduced 4 --num_obs 4 \
  --num_prime 50 --max_steps 300 --goal_arc 120 --v_des $VDES \
  --noise beta --noise_level 0.3 --obstacles 40:0 90:0.2"

for MODE in det cvar mmd_opt; do
  timeout 6000 python -m mpc_mmd_tpu.cli.closedloop --mode $MODE $COMMON \
    > $OUT/matrix_beta_$MODE.json 2> $OUT/matrix_beta_$MODE.err
  tail -1 $OUT/matrix_beta_$MODE.json
done
python $OUT/summarize.py "matrix_beta_*.json"
