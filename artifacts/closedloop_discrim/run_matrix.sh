#!/bin/bash
# Phase 2 of the discriminating closed-loop hunt: the full seeded-episode
# matrix on the scenario the det-baseline probe (search.sh) found.
#
# Scenario (probe results: det collided 10/10 at 140:0.3+noise 0.2 —
# likely too tight for anyone — and 5/10 at 140:0.2+noise 0.3, the
# discriminating regime): curved route, obstacles at arc 60 m (centered
# on lane 1, l=0) and arc 140 m at l=0.2 — passable via lane 2 (l=3.5)
# with ~0.3 ellipse-units of clearance at the lane center — gaussian
# actuation noise 0.3 on the applied control (main_carla.py:415-436
# semantics).  20 seeded episodes per mode; seeds are the episode index,
# identical across modes (paired scenarios).  mmd_rt = mmd_opt at the
# certified realtime inner-CEM budget (64x12) — the production operating
# point.
set -x
cd "$(dirname "$0")/../.."
OUT=artifacts/closedloop_discrim
COMMON="--episodes 20 --route curved --num_reduced 4 --num_obs 4 \
  --num_prime 50 --max_steps 150 --goal_arc 200 \
  --noise gaussian --noise_level 0.3 --obstacles 60:0 140:0.2"

for MODE in det cvar mmd_opt; do
  timeout 4000 python -m mpc_mmd_tpu.cli.closedloop --mode $MODE $COMMON \
    > $OUT/matrix_$MODE.json 2> $OUT/matrix_$MODE.err
  tail -1 $OUT/matrix_$MODE.json
done
timeout 4000 python -m mpc_mmd_tpu.cli.closedloop --mode mmd_opt \
  --inner_budget 64x12 $COMMON \
  > $OUT/matrix_mmd_rt.json 2> $OUT/matrix_mmd_rt.err
tail -1 $OUT/matrix_mmd_rt.json
