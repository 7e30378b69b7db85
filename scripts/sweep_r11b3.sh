#!/bin/bash
# Round-4 chip queue, phase B3 — flagship attempt #3 at north star #2.
#
# Recipe: the res16 narrow-band reservoir config (682 record) + gate 5 +
# cooldown 250 + the round-4 unpacked learner (6.36 ms/update) + the
# colored consistency fill on a CURRICULUM: scalar (reference parity)
# for the first 75k updates, then per-sample colored dose p=0.25.
# Attempts 1-2 measured any colored dose from update 1 as a stall
# (roll-20 ~55-80 at 25k); the curriculum gives the critic the narrow-
# band learning curve first, then layers the camouflage invariance on a
# competent representation. First 75k ≡ the verdict-mandated narrow
# baseline, so this run also validates the unpacked stack end to end.
set -x
set -o pipefail
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 1 --log_dir runs/flag_r4w --consistency_fill color --consistency_fill_warmup 75000"
WD=runs/flag_r4w/walker_walk/sgsac/1

python scripts/watchdog.py --watch "$WD" --stall-sec 420 --grace-sec 1800 \
  --max-restarts 6 --log /tmp/watchdog_r4w.log -- \
  python -m sgqn_carla_tpu.train.train $FLAG \
    --train_steps 250k --init_steps 1000 --eval_mode none \
    --num_envs 16 --save_freq 12500 --replay_capacity 200000 \
    --replay_policy reservoir --guard_collapse 0.25 \
    --td_anomaly_gate 5 --td_gate_cooldown 250 \
  || echo "FLAG_R4W rc=$?"

# video_hard checkpoint timeline (8 episodes; wall clock = ckpt mtimes).
for s in 250000 225000 200000 187500 175000 162500 150000 137500 125000 100000 75000; do
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
