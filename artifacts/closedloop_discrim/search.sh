#!/bin/bash
# Phase 1 of the discriminating closed-loop hunt (VERDICT r2 item 5):
# probe candidate passable-but-tight scenarios with the det baseline
# (10 seeded episodes each) to find one where the noise-blind planner
# collides at a measurable rate.  Phase 2 (run_matrix.sh) then runs the
# full 20-seed x {det, cvar, mmd_opt} matrix on the chosen variant.
#
# Scenario geometry: onroad lanes at l=0 and l=3.5, obstacle safety
# ellipse b_obs=3.0.  An obstacle at (140, l2) leaves a lateral clearance
# of |3.5 - l2| - 3.0 ellipse-margin in the far lane; l2 in [0, 0.5]
# sweeps that clearance from 0.5 m down to 0 (round-2's passable runs at
# l2=0 showed det grazing at min_margin 0.004-0.071 vs mmd 0.085+).
set -x
cd "$(dirname "$0")/../.."
OUT=artifacts/closedloop_discrim
run() {  # run <tag> <noise> <level> <obs...>
  tag=$1; noise=$2; lvl=$3; shift 3
  timeout 3600 python -m mpc_mmd_tpu.cli.closedloop --mode det \
    --episodes 10 --route curved --num_reduced 4 --num_obs 4 \
    --num_prime 50 --max_steps 150 --goal_arc 200 \
    --noise $noise --noise_level $lvl --obstacles "$@" \
    > $OUT/search_det_$tag.json 2> $OUT/search_det_$tag.err
  tail -1 $OUT/search_det_$tag.json
}
run l2_03_g02 gaussian 0.2 60:0 140:0.3
run l2_02_g03 gaussian 0.3 60:0 140:0.2
run l2_00_g03 gaussian 0.3 60:0 140:0
