#!/bin/bash
# Next-session sweep (written at the end of the hopper-validation session).
# Lessons encoded from that session, on a 1-CPU host with a COLD .jax_cache:
#   - hopper drq train-chunk compile: ~13 min cold, seconds warm. Budget
#     cold compiles INTO every timeout (the r7-style 500s bench timeout
#     killed the 2048-env bench mid-compile and cached nothing).
#   - hopper-stand IS learnable post-stiction-fix: roll-20 164 @ 63k and
#     still climbing (artifacts/hopper_stand_drq_r2). Finish the curve.
set -x
cd /root/repo

# 1. Hopper to saturation (the >600 bar): 300k updates, ~65 min warm.
timeout 5400 python -m sgqn_carla_tpu.train.train \
  --domain_name hopper --task_name stand --algorithm drq --train_steps 300k \
  --init_steps 1000 --eval_mode none --num_envs 8 --save_freq 25k --seed 0 \
  --log_dir runs/hopper_r3 || echo "HOPPER rc=$?"

# 2. Flagship wide-band SGQN (north star #2): 250k @ 16 envs with the
#    production recipe + the overlay band widened into the test-video
#    frequency range (ddadd66) — the one recipe change aimed squarely at
#    video_hard >= 750. ~55 min warm + ~10 min cold compile.
FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 3 --log_dir runs/flag_r2w"
timeout 4500 python -m sgqn_carla_tpu.train.train $FLAG \
  --train_steps 250k --num_envs 16 --replay_capacity 200000 \
  --replay_policy reservoir --guard_collapse 0.25 --td_gate_cooldown 150 \
  --overlay_band wide --save_freq 25k --eval_mode none || echo "FLAG rc=$?"

WD=runs/flag_r2w/walker_walk/sgsac/3
for mode in video_hard train video_easy color_hard; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250k \
    --eval_mode "$mode" --eval_episodes 8 || echo "EVAL $mode rc=$?"
done

# 3. Bench env-batch re-sweep with timeouts that survive cold compiles.
for E in 2048 1536; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=20 timeout 1200 python bench.py \
    | tee -a /tmp/bench_sweep_r8.log
done

echo "=== SWEEP R8 DONE ==="
