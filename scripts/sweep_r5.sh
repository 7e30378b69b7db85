#!/bin/bash
# Round-5 sweep — follows the critic-LayerNorm collapse ablation
# (runs/vln16, scripts/sweep_r4.sh part 2; artifact:
# artifacts/walker_walk_sgsac_vln16 once committed).
#
# 1. Offline eval of the vln16 final checkpoint on every reference eval
#    mode INCLUDING distracting_cs at the three benchmark intensities —
#    distracting_cs is the one eval surface with no committed walker
#    numbers yet (reference: arguments.py:112-128).
# 2. If the ablation removed/moved the ~183k cliff: the flagship
#    production run — 400k updates, reservoir + LayerNorm + guard as a
#    belt-and-braces recipe, seed 2 — intended as the best committed
#    checkpoint (expect >50 min; uses true resume if interrupted).
set -x
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 1 --log_dir runs/vln16 --q_head_layernorm"

oev() {  # offline eval: <mode> [extra args]
  mode=$1; shift
  timeout 2400 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 220k \
    --eval_mode "$mode" --eval_episodes 8 "$@" || echo "EVAL $mode FAILED rc=$?"
}

oev train
oev color_hard
oev video_easy
oev video_hard
oev distracting_cs --distracting_cs_intensity 0.1
oev distracting_cs --distracting_cs_intensity 0.3
oev distracting_cs --distracting_cs_intensity 0.5

# --- flagship production run (only if the ablation held past ~190k)
timeout 14000 python -m sgqn_carla_tpu.train.train \
  --domain_name walker --task_name walk --algorithm sgsac --train_steps 400k \
  --init_steps 1000 --eval_mode none --num_envs 16 --save_freq 50k --seed 2 \
  --replay_capacity 200000 --replay_policy reservoir --q_head_layernorm \
  --guard_collapse 0.25 --log_dir runs/flagship400k || echo "FLAGSHIP FAILED rc=$?"

echo "=== SWEEP R5 DONE ==="
