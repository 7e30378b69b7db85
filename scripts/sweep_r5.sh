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
  # 200k = the last save_freq=25k multiple the vln16 run actually wrote
  # (the loop has no terminal save; 220k would silently fall back)
  timeout 2400 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 200k \
    --eval_mode "$mode" --eval_episodes 8 "$@" || echo "EVAL $mode FAILED rc=$?"
}

oev train
oev color_hard
oev video_easy
oev video_hard
oev distracting_cs --distracting_cs_intensity 0.1
oev distracting_cs --distracting_cs_intensity 0.3
oev distracting_cs --distracting_cs_intensity 0.5

# --- flagship production run, gated on the ablation actually holding:
# launch only if the vln16 train-mode eval scored above the collapse floor
# (a collapsed 183k-cliff run evals far below 300)
VLN16_R=$(python - <<'EOF'
import json, sys
try:
    r = json.load(open("runs/vln16/walker_walk/sgsac/1/eval_train.json"))["reward"]
except Exception:
    r = -1
print(int(float(r)))
EOF
)
if [ "$VLN16_R" -lt 300 ]; then
  echo "vln16 ablation did not hold (eval_train reward=$VLN16_R < 300); skipping flagship"
  exit 0
fi
timeout 14000 python -m sgqn_carla_tpu.train.train \
  --domain_name walker --task_name walk --algorithm sgsac --train_steps 400k \
  --init_steps 1000 --eval_mode none --num_envs 16 --save_freq 50k --seed 2 \
  --replay_capacity 200000 --replay_policy reservoir --q_head_layernorm \
  --guard_collapse 0.25 --log_dir runs/flagship400k || echo "FLAGSHIP FAILED rc=$?"

echo "=== SWEEP R5 DONE ==="
