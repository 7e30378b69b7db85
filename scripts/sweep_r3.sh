#!/bin/bash
# Round-3 learning-evidence sweep: domains with no committed training
# artifact yet (reacher / pendulum / point_mass / swimmer / manipulator /
# humanoid) plus the hopper-stand longer-budget follow-up promised in
# artifacts/hopper_stand_drq_tpu/README.md.
# Sequential on the one tunneled TPU chip; each run bounded by timeout.
set -x
cd /root/repo
COMMON="--init_steps 1000 --num_envs 8 --eval_freq 25k --eval_episodes 4 --save_freq 50k --seed 0 --eval_mode none"

run() {  # run <tag> <timeout_s> <args...>
  tag=$1; t=$2; shift 2
  echo "=== RUN $tag: $* ==="
  timeout "$t" python -m sgqn_carla_tpu.train.train "$@" || echo "RUN $tag FAILED rc=$?"
}

# Cheap single-arm domains: DrQ, 100k updates each.
run reacher_easy    3600 --algorithm drq --domain_name reacher    --task_name easy    --train_steps 100k $COMMON
run pendulum_swing  3600 --algorithm drq --domain_name pendulum   --task_name swingup --train_steps 100k $COMMON
run pointmass_easy  3600 --algorithm drq --domain_name point_mass --task_name easy    --train_steps 100k $COMMON

# Swimmer: slow learner by reputation; record honestly.
run swimmer6        5400 --algorithm drq --domain_name swimmer    --task_name swimmer6 --train_steps 100k $COMMON

# Hopper-stand follow-up: 3x budget, new seed (README follow-up item).
run hopper_stand_3x 7200 --algorithm svea --domain_name hopper --task_name stand --train_steps 300k \
    --init_steps 1000 --num_envs 8 --eval_freq 50k --eval_episodes 4 --save_freq 100k --seed 1 --eval_mode none

# Contact-solver showcase (implicit solver) + high-dof stretch.
run manip_bring     7200 --algorithm svea --domain_name manipulator --task_name bring_ball --train_steps 100k $COMMON
run humanoid_stand  7200 --algorithm svea --domain_name humanoid    --task_name stand      --train_steps 100k $COMMON

echo "=== SWEEP R3 DONE ==="
