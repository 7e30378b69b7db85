#!/bin/bash
# Round-3 sweep: flagship FIRST (north star #2 is the round's top verdict item),
# then its eval battery, then hopper saturation, then the bench re-sweep.
# Advisor fixes vs sweep_r8: pipefail, --overlay_band wide lives in $FLAG so the
# eval JSONs record the training recipe, and the work dir is asserted before evals.
set -x
set -o pipefail
cd /root/repo

# 1. Flagship wide-band SGQN (north star #2): 250k @ 16 envs with the production
#    recipe (reservoir + guard + td-gate cooldown) + wide overlay band (ddadd66).
#    ~55 min warm; compiles should be cached from the round-2 flagship.
FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 3 --log_dir runs/flag_r3 --overlay_band wide"
timeout 5400 python -m sgqn_carla_tpu.train.train $FLAG \
  --train_steps 250k --num_envs 16 --replay_capacity 200000 \
  --replay_policy reservoir --guard_collapse 0.25 --td_gate_cooldown 150 \
  --save_freq 25k --eval_mode none || echo "FLAG rc=$?"

WD=runs/flag_r3/walker_walk/sgsac/3
test -d "$WD" || echo "MISSING WORKDIR $WD"

# 2. Eval battery, video_hard first (the headline number).
for mode in video_hard train video_easy color_hard; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250k \
    --eval_mode "$mode" --eval_episodes 8 || echo "EVAL $mode rc=$?"
done

# 3. Hopper to saturation (the >600 bar): 300k updates, ~65 min warm.
timeout 5400 python -m sgqn_carla_tpu.train.train \
  --domain_name hopper --task_name stand --algorithm drq --train_steps 300k \
  --init_steps 1000 --eval_mode none --num_envs 8 --save_freq 25k --seed 0 \
  --log_dir runs/hopper_r3 || echo "HOPPER rc=$?"

# 4. Bench env-batch re-sweep with timeouts that survive cold compiles.
for E in 2048 1536; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=20 timeout 1200 python bench.py \
    | tee -a /tmp/bench_sweep_r9.log || echo "BENCH $E rc=$?"
done

echo "=== SWEEP R9 DONE ==="
