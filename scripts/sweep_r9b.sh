#!/bin/bash
# Round-3 chip queue, part 2 (after the hopper 300k run frees the chip).
#
# Stage order mirrors the verdict's priorities:
#   0. profile_update A/B (precision / concat / mask) — the learner split
#   1. flagship cooldown soak #2 with the recipe derived from soak #1
#      (docs/PERF.md "Cooldown soak #1"): gate 5, cooldown 250, save 12.5k
#   2. eval battery on the soak-#2 best checkpoint (video_hard headline)
#   3. ball_in_cup color_hard re-eval (recalibrated procedural pool, c629fdb)
#   4. host-spill overhead probe (600k capacity @ num_envs=1, short)
#   5. bench env-batch re-sweep
set -x
set -o pipefail
cd /root/repo

# -1/0. Probes (conv MXU-lane microbench, hopper state-SAC discriminator,
#       profile_update A/B) run manually before this script so their
#       findings can adjust the flagship config; set SKIP_PROBES=0 to run
#       them here instead.
if [ "${SKIP_PROBES:-1}" != "1" ]; then
  timeout 1200 python scripts/profile_conv.py 128 39 50 \
    | tee -a /tmp/profile_conv_r3.log || echo "CONV rc=$?"
  timeout 2400 python scripts/probe_state_sac.py hopper stand 200000 0 \
    | tee /tmp/probe_hopper_state.log | tail -3 || echo "HPROBE rc=$?"
  for CFG in "bf16 0" "bf16 1" "f32 0"; do
    set -- $CFG
    SGQN_PROFILE_PRECISION=$1 SGQN_SGSAC_CONCAT=$2 timeout 1200 \
      python scripts/profile_update.py 128 100 \
      | tee -a /tmp/profile_update_r3.log || echo "PROFILE $CFG rc=$?"
  done
fi

# 1. Flagship soak #2 (same seed as soak #1 so the burst timeline is
#    comparable): wide band + reservoir + guard + gate 5 / cooldown 250.
date +"FLAG_START %s"
FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 3 --log_dir runs/flag_r3b --overlay_band wide"
timeout 7200 python -m sgqn_carla_tpu.train.train $FLAG \
  --train_steps 250k --num_envs 16 --replay_capacity 200000 \
  --replay_policy reservoir --guard_collapse 0.25 \
  --td_anomaly_gate 5 --td_gate_cooldown 250 \
  --save_freq 12500 --eval_mode none || echo "FLAG rc=$?"
date +"FLAG_END %s"

WD=runs/flag_r3b/walker_walk/sgsac/3
test -d "$WD" || echo "MISSING WORKDIR $WD"

# 2a. video_hard checkpoint timeline (the <1h wall-clock claim needs the
#     crossing step, not just the final number; save_freq 12500 gives the
#     grid, checkpoint dir mtimes give the wall clock).
for s in 250000 200000 175000 150000 137500 125000 100000; do
  if [ -d "$WD/model/$s" ] || [ -f "$WD/model/$s.npz" ]; then
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps $s \
      --eval_mode video_hard --eval_episodes 8 || echo "EVAL vh@$s rc=$?"
    mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_$s.json" 2>/dev/null
  fi
done

# 2b. Full mode battery at the final checkpoint.
for mode in video_hard train video_easy color_hard color_easy; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250k \
    --eval_mode "$mode" --eval_episodes 8 || echo "EVAL $mode rc=$?"
done

# 3. ball_in_cup color_hard with the recalibrated pool (the 6.5 headline
#    fix). The round-2 artifact kept no checkpoint, so retrain (~29 min)
#    and re-run the eval battery against the calibrated color walk.
BIC="--algorithm sgsac --domain_name ball_in_cup --task_name catch --seed 0 --log_dir runs/bic_r3"
timeout 3600 python -m sgqn_carla_tpu.train.train $BIC --train_steps 100k \
  --num_envs 8 --eval_mode none --save_freq 25k || echo "BIC-train rc=$?"
for mode in color_hard color_easy video_easy; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $BIC --train_steps 100k \
    --eval_mode "$mode" --eval_episodes 8 || echo "BIC-eval $mode rc=$?"
done

# 4. Host-spill overhead probe: reference capacity at num_envs=1, 8k steps
#    (measures chunk time with spill vs the committed no-spill numbers).
timeout 2400 python -m sgqn_carla_tpu.train.train \
  --algorithm sgsac --domain_name walker --task_name walk --seed 11 \
  --train_steps 8k --num_envs 1 --replay_spill host \
  --replay_device_capacity 100000 --eval_mode none \
  --log_dir runs/spill_probe || echo "SPILL rc=$?"

# 5. Bench env-batch re-sweep with compile-safe timeouts.
for E in 2048 1536; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=20 timeout 1800 python bench.py \
    | tee -a /tmp/bench_sweep_r9b.log || echo "BENCH $E rc=$?"
done

echo "=== SWEEP R9B DONE ==="
