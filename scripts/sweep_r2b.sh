#!/bin/bash
# Round-2 follow-up sweep: prove the round-2 engine extensions LEARN.
# The domains added this round (free/ball joints, implicit solver) get an
# end-to-end training artifact each: hopper (planar contacts + the new
# torso free root), fish (3D free-root swimming, no contacts), quadruped
# (22-dof ball-joint contacts).
#
# DEADLINE_EPOCH: no new run starts after this (leaves the chip free for
# the end-of-round bench); every run is timeout-bounded anyway.
set -x
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}
COMMON="--train_steps 100k --init_steps 1000 --num_envs 8 --eval_freq 25k --eval_episodes 4 --save_freq 50k --seed 0 --eval_mode none"

run() {  # run <tag> <timeout_s> <args...>
  tag=$1; to=$2; shift 2
  if [ "$DEADLINE_EPOCH" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
    echo "=== SKIP $tag: past deadline ==="
    return
  fi
  echo "=== RUN $tag: $* ==="
  timeout "$to" python -m sgqn_carla_tpu.train.train "$@" || echo "RUN $tag FAILED rc=$?"
}

run drq_hopper 4200 --algorithm drq --domain_name hopper --task_name stand $COMMON
run drq_fish   4200 --algorithm drq --domain_name fish --task_name upright $COMMON
run svea_quad  5400 --algorithm svea --domain_name quadruped --task_name walk $COMMON

echo "=== SWEEP R2B DONE ==="
