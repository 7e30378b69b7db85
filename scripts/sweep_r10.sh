#!/bin/bash
# Round-3 chip queue, part 3 — runs AFTER the flagship soak #2 (flag_r3b)
# frees the chip. Stage order by verdict priority:
#   1. video_hard checkpoint timeline on flag_r3b (north star #2 evidence)
#   2. full eval-mode battery at the final checkpoint
#   3. profile_update A/B: packed grouped-conv update vs separate forwards
#      (SGQN_PACKED) and the folded aux pass (SGQN_AUX_FOLD)
#   4. ball_in_cup retrain + color eval battery (recalibrated pool)
#   5. hopper state-SAC discriminator probe
#   6. host-spill overhead probe
#   7. bench env-batch re-sweep
set -x
set -o pipefail
cd /root/repo

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 3 --log_dir runs/flag_r3b --overlay_band wide"
WD=runs/flag_r3b/walker_walk/sgsac/3
test -d "$WD" || echo "MISSING WORKDIR $WD"

# 1. video_hard timeline (crossing step for the <1h claim; checkpoint dir
#    mtimes give the wall clock).
for s in 250000 200000 175000 150000 137500 125000 100000; do
  if [ -d "$WD/model/$s" ] || [ -f "$WD/model/$s.npz" ]; then
    timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps $s \
      --eval_mode video_hard --eval_episodes 8 || echo "EVAL vh@$s rc=$?"
    mv -f "$WD/eval_video_hard.json" "$WD/eval_video_hard_$s.json" 2>/dev/null
  fi
done

# 2. Full mode battery at the final checkpoint.
for mode in video_hard train video_easy color_hard color_easy; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps 250k \
    --eval_mode "$mode" --eval_episodes 8 || echo "EVAL $mode rc=$?"
done

# 3. Learner A/B (packed / fold / precision).
for CFG in "1 0" "1 1" "0 0"; do
  set -- $CFG
  SGQN_PACKED=$1 SGQN_AUX_FOLD=$2 timeout 1800 \
    python scripts/profile_update.py 128 100 \
    | tee -a /tmp/profile_update_r10.log || echo "PROFILE p=$1 f=$2 rc=$?"
done

# 4. ball_in_cup color_hard with the recalibrated pool.
BIC="--algorithm sgsac --domain_name ball_in_cup --task_name catch --seed 0 --log_dir runs/bic_r3"
timeout 3600 python -m sgqn_carla_tpu.train.train $BIC --train_steps 100k \
  --num_envs 8 --eval_mode none --save_freq 25k || echo "BIC-train rc=$?"
for mode in color_hard color_easy video_easy train; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $BIC --train_steps 100k \
    --eval_mode "$mode" --eval_episodes 8 || echo "BIC-eval $mode rc=$?"
done

# 5. hopper state-SAC probe (env-defect vs pixel-hardness discriminator).
timeout 2400 python scripts/probe_state_sac.py hopper stand 200000 0 \
  | tee /tmp/probe_hopper_state.log | tail -3 || echo "HPROBE rc=$?"

# 6. Host-spill overhead probe (reference capacity at num_envs=1).
timeout 2400 python -m sgqn_carla_tpu.train.train \
  --algorithm sgsac --domain_name walker --task_name walk --seed 11 \
  --train_steps 8k --num_envs 1 --replay_spill host \
  --replay_device_capacity 100000 --eval_mode none \
  --log_dir runs/spill_probe || echo "SPILL rc=$?"

# 7. Bench env-batch re-sweep.
for E in 2048 1536 1024; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=20 timeout 1800 python bench.py \
    | tee -a /tmp/bench_sweep_r10.log || echo "BENCH $E rc=$?"
done

echo "=== SWEEP R10 DONE ==="
