#!/bin/bash
# Round-4 chip queue, phase C — remaining round-3 validation debt
# (sweep_r10 stages 4-7): hopper state probe, host-spill overhead probe,
# ball_in_cup retrain + recalibrated color battery, bench re-sweep.
set -x
set -o pipefail
cd /root/repo

# 3 (moved from phase A, cut when the flagship took the chip): learner A/B
# packed / fold / unpacked, 3 reps each for noise bars (one packed rep
# already logged in /tmp/profile_update_r11.log: sgsac 8.697 ms).
for REP in 1 2 3; do
  for CFG in "0 0" "1 0" "1 1"; do
    set -- $CFG
    SGQN_PACKED=$1 SGQN_AUX_FOLD=$2 timeout 1800 \
      python scripts/profile_update.py 128 100 \
      | tee -a /tmp/profile_update_r11.log || echo "PROFILE p=$1 f=$2 rc=$?"
  done
done

# 5. hopper state-SAC probe (env-defect vs pixel-hardness discriminator).
timeout 3600 python scripts/probe_state_sac.py hopper stand 200000 0 \
  | tee /tmp/probe_hopper_state.log | tail -3 || echo "HPROBE rc=$?"

# 6. Host-spill overhead probe (reference capacity at num_envs=1):
#    same config device-only first, then spilled — the delta is the
#    chunk-boundary exchange overhead (<10% target).
for SPILL in none host; do
  timeout 2400 python -m sgqn_carla_tpu.train.train \
    --algorithm sgsac --domain_name walker --task_name walk --seed 11 \
    --train_steps 8k --num_envs 1 --replay_spill $SPILL \
    --replay_device_capacity 4000 --eval_mode none \
    --log_dir runs/spill_probe_$SPILL || echo "SPILL $SPILL rc=$?"
done

# 4. ball_in_cup retrain + color eval battery (recalibrated pool).
BIC="--algorithm sgsac --domain_name ball_in_cup --task_name catch --seed 0 --log_dir runs/bic_r4"
timeout 3600 python scripts/watchdog.py \
  --watch runs/bic_r4/ball_in_cup_catch/sgsac/0 --stall-sec 420 \
  --grace-sec 1500 --max-restarts 3 --log /tmp/watchdog_bic.log -- \
  python -m sgqn_carla_tpu.train.train $BIC --train_steps 100k \
  --num_envs 8 --eval_mode none --save_freq 25k || echo "BIC-train rc=$?"
for mode in color_hard color_easy video_easy train; do
  timeout 1800 python -m sgqn_carla_tpu.train.eval $BIC --train_steps 100k \
    --eval_mode "$mode" --eval_episodes 8 || echo "BIC-eval $mode rc=$?"
done

# 7. Bench env-batch re-sweep (the 1024 sweet spot predates the round-2/3
#    program changes).
for E in 2048 1536 1024 768; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=100 timeout 1800 python bench.py \
    | tee -a /tmp/bench_sweep_r11.log || echo "BENCH $E rc=$?"
done

# 8. Env-step bound certification (round-3 verdict item #7): optimized-HLO
#    op count + on-chip VPU-rate calibration + measured throughput.
timeout 2400 python scripts/bound_env_step.py 1024 200 \
  | tee /tmp/bound_env_step.json || echo "BOUND rc=$?"

echo "=== SWEEP R11C DONE ==="
