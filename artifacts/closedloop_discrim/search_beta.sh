#!/bin/bash
# Beta-noise closed-loop scenario hunt (VERDICT r3 item 4).  The round-3
# probe found the reference's beta noise model (σ·(2·Beta(2|u|,5|u|)−1),
# mean ≈ −0.43σ|u| — a ~13% deceleration bias at σ=0.3) stalls arc
# progress before the gaussian-matrix obstacles (arc 60/140) within the
# 150-step cap.  Compensate on all three axes the verdict names: obstacles
# at SHORTER arc, HIGHER v_des, RAISED step cap — then probe with the det
# baseline (10 seeded episodes each) for a measurable-but-not-saturated
# collision rate, exactly like search.sh did for gaussian noise.
set -x
cd "$(dirname "$0")/../.."
OUT=artifacts/closedloop_discrim
run() {  # run <tag> <v_des> <max_steps> <goal> <obs...>
  tag=$1; vdes=$2; steps=$3; goal=$4; shift 4
  timeout 4000 python -m mpc_mmd_tpu.cli.closedloop --mode det \
    --episodes 10 --route curved --num_reduced 4 --num_obs 4 \
    --num_prime 50 --max_steps $steps --goal_arc $goal --v_des $vdes \
    --noise beta --noise_level 0.3 --obstacles "$@" \
    > $OUT/search_det_beta_$tag.json 2> $OUT/search_det_beta_$tag.err
  tail -1 $OUT/search_det_beta_$tag.json
}
run v20_a40_90_l02 20 300 120 40:0 90:0.2
run v25_a40_90_l02 25 300 120 40:0 90:0.2
run v20_a40_80_l03 20 300 110 40:0 80:0.3
