#!/bin/bash
# Round-5 PRE-REGISTERED replication of the beta-noise clearance endpoint
# (VERDICT r4 weak #5 / next-round item 4).  Protocol identical to
# run_matrix_beta.sh (MATRIX_VDES=25 regime) except FRESH seeds 100-119
# via --seed_base.  The pre-registration (endpoints + decision rule) was
# committed in SUMMARY.md before this script ran; do not edit the regime.
set -x
cd "$(dirname "$0")/../.."
OUT=artifacts/closedloop_discrim
COMMON="--episodes 20 --seed_base 100 --route curved --num_reduced 4 \
  --num_obs 4 --num_prime 50 --max_steps 300 --goal_arc 120 --v_des 25 \
  --noise beta --noise_level 0.3 --obstacles 40:0 90:0.2"

for MODE in cvar mmd_opt; do
  timeout 6000 python -m mpc_mmd_tpu.cli.closedloop --mode $MODE $COMMON \
    > $OUT/repl_beta_$MODE.json 2> $OUT/repl_beta_$MODE.err
  tail -1 $OUT/repl_beta_$MODE.json
done
python $OUT/summarize.py "repl_beta_*.json"
