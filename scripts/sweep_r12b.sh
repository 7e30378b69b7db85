#!/bin/bash
# Round-5 chip queue, phase B — multi-seed flagship statistics (round-4
# verdict items #2/#3/#5/#7).
#
# 3 fresh seeds x 250k of the verdict-mandated production recipe (res16
# narrow-band reservoir + gate 5 + cooldown 250, ~51 min/run measured in
# flag_r4n), every run under the wedge watchdog and with the round-5
# burst forensics live (burst_log.jsonl: flagged-minibatch replay
# provenance + per-sample TD errors — the collapse-trigger hypothesis
# data). Seeds 2/3/4: seed 1 with this exact recipe would replay
# flag_r4n's driver RNG path; fresh draws are the point.
#
# Per seed, an offline eval battery on BOTH video_hard pools:
#   * dmcgb (round-5 default: dominant-color statistics matched to real
#     DAVIS/DMCGB — the corrected, more faithful benchmark), and
#   * harsh (the pre-round-5 uniform pool, ~19% warm-camouflage) for
#     comparability with the 682 record;
# plus video_easy / color_hard / train, and a checkpoint-timeline
# video_hard row at 187.5k.
#
# Finally: one eval battery through a synthesized DMCGB-FORMAT tree
# (--external_data_dir; real torch-pickle + mp4 + JPEG decode paths) so
# the external-data pipeline is exercised end-to-end, not just unit-
# tested (verdict item #7).
set -x
set -o pipefail
cd /root/repo

for SEED in 2 3 4; do
  FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed $SEED --log_dir runs/flag_r5"
  WD=runs/flag_r5/walker_walk/sgsac/$SEED
  timeout 7200 python scripts/watchdog.py --watch "$WD" --stall-sec 420 \
    --grace-sec 1800 --max-restarts 6 --log /tmp/watchdog_r5_$SEED.log -- \
    python -m sgqn_carla_tpu.train.train $FLAG \
      --train_steps 250k --init_steps 1000 --eval_mode none \
      --num_envs 16 --save_freq 12500 --replay_capacity 200000 \
      --replay_policy reservoir --guard_collapse 0.25 \
      --td_anomaly_gate 5 --td_gate_cooldown 250 \
    || echo "FLAG_R5 seed=$SEED rc=$?"

  # final-checkpoint battery: corrected pool (default) + old pool
  for mode in video_hard video_easy color_hard train; do
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG \
      --train_steps 250000 --eval_mode "$mode" --eval_episodes 24 \
      || echo "EVAL $mode seed=$SEED rc=$?"
    mv -f "$WD/eval_$mode.json" "$WD/eval_${mode}_250000_24ep.json" 2>/dev/null
  done
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG \
    --train_steps 250000 --eval_mode video_hard --eval_episodes 24 \
    --video_pool harsh || echo "EVAL vh-harsh seed=$SEED rc=$?"
  mv -f "$WD/eval_video_hard.json" \
    "$WD/eval_video_hard_harsh_250000_24ep.json" 2>/dev/null
  # pre-collapse-window timeline point
  if [ -d "$WD/model/187500" ] || [ -f "$WD/model/187500.npz" ]; then
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG \
      --train_steps 187500 --eval_mode video_hard --eval_episodes 24 \
      || echo "EVAL vh@187500 seed=$SEED rc=$?"
    mv -f "$WD/eval_video_hard.json" \
      "$WD/eval_video_hard_187500_24ep.json" 2>/dev/null
  fi
done

# ---- external-data pipeline end-to-end (verdict item #7): synthesize the
# DMCGB-format tree (torch .pt + mp4 + JPEG) and run one battery through it
python scripts/gen_dmcgb_tree.py runs/dmcgb_synth 0 || echo "GEN rc=$?"
FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 2 --log_dir runs/flag_r5"
WD=runs/flag_r5/walker_walk/sgsac/2
for mode in video_hard color_hard; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG \
    --train_steps 250000 --eval_mode "$mode" --eval_episodes 24 \
    --external_data_dir runs/dmcgb_synth \
    || echo "EVAL ext $mode rc=$?"
  mv -f "$WD/eval_$mode.json" "$WD/eval_${mode}_external_250000_24ep.json" \
    2>/dev/null
done

echo "=== SWEEP R12B DONE ==="
