#!/bin/bash
# Round-4 chip queue, phase A — the round-3 validation debt (sweep_r10
# stages 1-3), run FIRST per the round-3 verdict ("run before you build").
#   1. flag_r3b video_hard checkpoint timeline (checkpoints that exist:
#      100k..175k; 150k/162.5k already evaluated in round 3)
#   2. full eval-mode battery at the best checkpoint (162.5k, roll-20 895)
#   3. learner A/B: packed grouped-conv update vs separate forwards
#      (SGQN_PACKED) and the folded aux pass (SGQN_AUX_FOLD)
set -x
set -o pipefail
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 3 --log_dir runs/flag_r3b --overlay_band wide"
WD=runs/flag_r3b/walker_walk/sgsac/3
if [ ! -d "$WD" ]; then echo "MISSING WORKDIR $WD"; exit 1; fi

# 1. video_hard timeline (crossing step for the <1h claim; checkpoint dir
#    mtimes give the wall clock). 150000/162500 already done (round 3).
for s in 175000 137500 125000 112500 100000; do
  if [ -f "$WD/eval_video_hard_$s.json" ]; then continue; fi
  if [ -d "$WD/model/$s" ] || [ -f "$WD/model/$s.npz" ]; then
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps $s \
      --eval_mode video_hard --eval_episodes 8 || echo "EVAL vh@$s rc=$?"
    mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_$s.json" 2>/dev/null
  fi
done

# 2. Full mode battery at the BEST checkpoint (162500; video_hard done).
for mode in train video_easy color_hard color_easy; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 162500 \
    --eval_mode "$mode" --eval_episodes 8 || echo "EVAL $mode rc=$?"
  mv -f "$WD/eval_$mode.json" "$WD/eval_${mode}_162500.json" 2>/dev/null
done

# 3. Learner A/B (packed / fold / unpacked), 3 reps each for noise bars.
for REP in 1 2 3; do
  for CFG in "1 0" "1 1" "0 0"; do
    set -- $CFG
    SGQN_PACKED=$1 SGQN_AUX_FOLD=$2 timeout 1800 \
      python scripts/profile_update.py 128 100 \
      | tee -a /tmp/profile_update_r11.log || echo "PROFILE p=$1 f=$2 rc=$?"
  done
done

echo "=== SWEEP R11A DONE ==="
