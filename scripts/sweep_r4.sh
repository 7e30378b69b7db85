#!/bin/bash
# Round-4 sweep (runs after the flagship 400k walker run in runs/flagship400k):
# 1. Offline eval of the flagship checkpoint across every reference eval mode
#    PLUS distracting_cs at three intensities (the one eval surface with no
#    committed numbers yet; reference: arguments.py:112-128).
# 2. The collapse-trigger ablation the res16 study queued up: identical
#    config to artifacts/walker_walk_sgsac_res16 (seed 1, reservoir, no
#    guard so rollbacks cannot mask the signal) + --q_head_layernorm.
#    Both prior runs collapsed at ~183k updates when reward hit ~860;
#    if critic-LayerNorm moves/removes the cliff, the "critic instability
#    near the reward optimum" hypothesis is confirmed and the recipe ships.
set -x
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --train_steps 400k --seed 2 --log_dir runs/flagship400k"

oev() {  # offline eval: <mode> [extra args]
  mode=$1; shift
  timeout 2400 python -m sgqn_carla_tpu.train.eval $FLAG \
    --eval_mode "$mode" --eval_episodes 8 "$@" || echo "EVAL $mode FAILED rc=$?"
}

oev train
oev color_hard
oev video_easy
oev video_hard
oev distracting_cs --distracting_cs_intensity 0.1
oev distracting_cs --distracting_cs_intensity 0.3
oev distracting_cs --distracting_cs_intensity 0.5

# --- ablation: does critic LayerNorm remove the ~183k-update cliff?
timeout 14000 python -m sgqn_carla_tpu.train.train \
  --domain_name walker --task_name walk --algorithm sgsac --train_steps 220k \
  --init_steps 1000 --eval_mode none --num_envs 16 --save_freq 25k --seed 1 \
  --replay_capacity 200000 --replay_policy reservoir --q_head_layernorm \
  --log_dir runs/vln16 || echo "ABLATION FAILED rc=$?"

echo "=== SWEEP R4 DONE ==="
