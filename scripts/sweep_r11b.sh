#!/bin/bash
# Round-4 chip queue, phase B — flagship attempt at north star #2
# (walker-walk SGQN video_hard >= 750 in < 1 h on one chip).
#
# Recipe: the round-2 narrow-band reservoir config that holds the 682
# record (artifacts/walker_walk_sgsac_res16), plus the round-3 learnings:
# gate 5 + cooldown 250 (catches the gate-10-blind cascade class) and the
# packed update's speed. The 250k run is ALSO soak #3: an uncut run under
# the wedge watchdog validates gate/cooldown containment end-to-end
# (round-3 verdict items #2 and #8).
set -x
set -o pipefail
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 1 --log_dir runs/flag_r4a"
WD=runs/flag_r4a/walker_walk/sgsac/1

# 1. The run itself, wedge-watchdogged (auto kill + resume on stall).
python scripts/watchdog.py --watch "$WD" --stall-sec 420 --grace-sec 1800 \
  --max-restarts 6 --log /tmp/watchdog_r4a.log -- \
  python -m sgqn_carla_tpu.train.train $FLAG \
    --train_steps 250k --init_steps 1000 --eval_mode none \
    --num_envs 16 --save_freq 12500 --replay_capacity 200000 \
    --replay_policy reservoir --guard_collapse 0.25 \
    --td_anomaly_gate 5 --td_gate_cooldown 250 \
  || echo "FLAG_R4A rc=$?"

# 2. video_hard checkpoint timeline (8 episodes; wall clock = ckpt mtimes).
for s in 250000 225000 200000 187500 175000 162500 150000 137500 125000 100000; do
  if [ -d "$WD/model/$s" ] || [ -f "$WD/model/$s.npz" ]; then
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps $s \
      --eval_mode video_hard --eval_episodes 8 || echo "EVAL vh@$s rc=$?"
    mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_$s.json" 2>/dev/null
  fi
done

# 3. Full mode battery at the final checkpoint, 12 episodes (the res16
#    comparison protocol). Re-runs video_hard at 12 eps for the headline.
for mode in video_hard train video_easy color_hard color_easy; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250000 \
    --eval_mode "$mode" --eval_episodes 12 || echo "EVAL $mode rc=$?"
  mv -f "$WD/eval_$mode.json" "$WD/eval_${mode}_250000_12ep.json" 2>/dev/null
done

echo "=== SWEEP R11B DONE ==="
