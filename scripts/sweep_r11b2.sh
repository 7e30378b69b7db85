#!/bin/bash
# Round-4 chip queue, phase B2 — flagship attempt #2 at north star #2
# (walker-walk SGQN video_hard >= 750 in < 1 h on one chip).
#
# Recipe: the round-2 narrow-band reservoir config that holds the 682
# record (artifacts/walker_walk_sgsac_res16) + round-3 learnings (gate 5 +
# cooldown 250, packed update) + ONE new lever: --overlay_band mix.
# Rationale (measured, runs/flag_r3b eval arrays): video_hard failure is
# bimodal — camouflage clips whose dominant color matches the walker's
# salmon body score ~50 while every other clip scores 700+; ~18% of the
# hard pool is camouflage. res16's 682 = 11 episodes @~740 + 1 camouflage
# @~50. The narrow/wide pools' dominant color is always ≈0.5 gray so
# training never sees a robot-colored scene; palette recentres each
# overlay on a random dominant color (the Places365 property the
# reference trains on). Frequency content stays narrow-band (wide's
# harshness was the measured regression).
#
# The 250k run is ALSO soak #3: uncut under the wedge watchdog validates
# gate/cooldown containment end-to-end (round-3 verdict items #2 and #8).
set -x
set -o pipefail
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 1 --log_dir runs/flag_r4mix2 --overlay_band mix --consistency_fill color"
WD=runs/flag_r4mix2/walker_walk/sgsac/1

# 1. The run itself, wedge-watchdogged (auto kill + resume on stall).
python scripts/watchdog.py --watch "$WD" --stall-sec 420 --grace-sec 1800 \
  --max-restarts 6 --log /tmp/watchdog_r4pal.log -- \
  python -m sgqn_carla_tpu.train.train $FLAG \
    --train_steps 250k --init_steps 1000 --eval_mode none \
    --num_envs 16 --save_freq 12500 --replay_capacity 200000 \
    --replay_policy reservoir --guard_collapse 0.25 \
    --td_anomaly_gate 5 --td_gate_cooldown 250 \
  || echo "FLAG_R4PAL rc=$?"

# 2. video_hard checkpoint timeline (8 episodes; wall clock = ckpt mtimes).
for s in 250000 225000 200000 187500 175000 162500 150000 137500 125000 100000; do
  if [ -d "$WD/model/$s" ] || [ -f "$WD/model/$s.npz" ]; then
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps $s \
      --eval_mode video_hard --eval_episodes 8 || echo "EVAL vh@$s rc=$?"
    mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_$s.json" 2>/dev/null
  fi
done

# 3. Full mode battery at the final checkpoint, 12 episodes (the res16
#    comparison protocol), plus a 24-episode video_hard draw for a
#    pool-representative headline (12 episodes hold only ~1 camouflage
#    clip at seed 1 — more episodes, more honest).
for mode in video_hard train video_easy color_hard color_easy; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250000 \
    --eval_mode "$mode" --eval_episodes 12 || echo "EVAL $mode rc=$?"
  mv -f "$WD/eval_$mode.json" "$WD/eval_${mode}_250000_12ep.json" 2>/dev/null
done
timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250000 \
  --eval_mode video_hard --eval_episodes 24 || echo "EVAL vh24 rc=$?"
mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_250000_24ep.json" 2>/dev/null

echo "=== SWEEP R11B DONE ==="
