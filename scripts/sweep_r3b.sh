#!/bin/bash
# Round-3 follow-up sweep (runs after sweep_r3.sh):
# - pendulum-swingup DrQ retry on a new seed (seed 0 hit the documented
#   hard-exploration failure mode: torque-limited swing-up + sparse reward
#   never discovers the upright region; the DrQ paper reports bimodal
#   seed outcomes on exactly this task)
# - acrobot-swingup DrQ (hard task, honest attempt for domain coverage)
# - SGQN reacher-easy with periodic video_hard eval (BASELINE.json config:
#   "sgsac on video_hard across the suite")
# - FLAGSHIP: SGQN walker-walk, 16 envs, 400k updates with the production
#   recipe (reservoir replay + collapse guard, 200k capacity) targeting
#   best-ever video_hard (BASELINE.md north star #2).
set -x
cd /root/repo
COMMON="--init_steps 1000 --num_envs 8 --eval_freq 25k --eval_episodes 4 --save_freq 50k --eval_mode none"

run() {  # run <tag> <timeout_s> <args...>
  tag=$1; t=$2; shift 2
  echo "=== RUN $tag: $* ==="
  timeout "$t" python -m sgqn_carla_tpu.train.train "$@" || echo "RUN $tag FAILED rc=$?"
}
oev() {  # offline eval: <mode> <args...>
  mode=$1; shift
  timeout 2400 python -m sgqn_carla_tpu.train.eval "$@" --eval_mode "$mode" --eval_episodes 8 || echo "EVAL $mode $* FAILED rc=$?"
}

run pendulum_seed3 3600 --algorithm drq --domain_name pendulum --task_name swingup --train_steps 100k --seed 3 $COMMON
run pointmass_seed3 3600 --algorithm drq --domain_name point_mass --task_name easy --train_steps 100k --seed 3 $COMMON
run acrobot_drq    5400 --algorithm drq --domain_name acrobot  --task_name swingup --train_steps 100k --seed 0 $COMMON

run sgsac_reacher  5400 --algorithm sgsac --domain_name reacher --task_name easy --train_steps 100k --seed 0 \
    --init_steps 1000 --num_envs 8 --eval_freq 25k --eval_episodes 4 --save_freq 50k --eval_mode video_hard
oev color_hard --algorithm sgsac --domain_name reacher --task_name easy --train_steps 100k --seed 0
oev video_easy --algorithm sgsac --domain_name reacher --task_name easy --train_steps 100k --seed 0

run sgsac_walker_400k 9000 --algorithm sgsac --domain_name walker --task_name walk --train_steps 400k --seed 0 \
    --init_steps 1000 --num_envs 16 --eval_freq 50k --eval_episodes 4 --save_freq 100k --eval_mode video_hard \
    --replay_capacity 200k --replay_policy reservoir --guard_collapse 0.25
oev color_hard --algorithm sgsac --domain_name walker --task_name walk --train_steps 400k --seed 0
oev video_easy --algorithm sgsac --domain_name walker --task_name walk --train_steps 400k --seed 0
oev video_hard --algorithm sgsac --domain_name walker --task_name walk --train_steps 400k --seed 0

echo "=== SWEEP R3B DONE ==="
