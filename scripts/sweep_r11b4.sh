#!/bin/bash
# Round-4 chip queue, phase B4 — flagship attempt #4 (clean narrow baseline) at north star #2.
#
# Recipe: the res16 narrow-band reservoir config (682 video_hard record,
# 919 train) + gate 5 + cooldown 250 + the round-4 unpacked learner
# (6.36 ms/update → full 250k in ~50 min wall incl. compiles).
# No experimental fills or bands: all three round-4 camouflage levers
# (palette pool, colored fill, fill curriculum) measured NEGATIVE for
# video_hard (see flag_r4pal / flag_r4w artifacts); this is the verdict-
# mandated clean baseline + speed + containment run.
set -x
set -o pipefail
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 1 --log_dir runs/flag_r4n"
WD=runs/flag_r4n/walker_walk/sgsac/1

python scripts/watchdog.py --watch "$WD" --stall-sec 420 --grace-sec 1800 \
  --max-restarts 6 --log /tmp/watchdog_r4w.log -- \
  python -m sgqn_carla_tpu.train.train $FLAG \
    --train_steps 250k --init_steps 1000 --eval_mode none \
    --num_envs 16 --save_freq 12500 --replay_capacity 200000 \
    --replay_policy reservoir --guard_collapse 0.25 \
    --td_anomaly_gate 5 --td_gate_cooldown 250 \
  || echo "FLAG_R4W rc=$?"

# video_hard checkpoint timeline (8 episodes; wall clock = ckpt mtimes).
for s in 250000 225000 200000 187500 175000 162500 150000 137500 125000 100000; do
  if [ -d "$WD/model/$s" ] || [ -f "$WD/model/$s.npz" ]; then
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps $s \
      --eval_mode video_hard --eval_episodes 8 || echo "EVAL vh@$s rc=$?"
    mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_$s.json" 2>/dev/null
  fi
done

# Full battery at the final checkpoint: 12 episodes (res16 protocol) +
# a 24-episode video_hard draw (pool-representative: ~6/24 camouflage).
for mode in video_hard train video_easy color_hard color_easy; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250000 \
    --eval_mode "$mode" --eval_episodes 12 || echo "EVAL $mode rc=$?"
  mv -f "$WD/eval_$mode.json" "$WD/eval_${mode}_250000_12ep.json" 2>/dev/null
done
timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250000 \
  --eval_mode video_hard --eval_episodes 24 || echo "EVAL vh24 rc=$?"
mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_250000_24ep.json" 2>/dev/null

echo "=== SWEEP R11B3 DONE ==="
