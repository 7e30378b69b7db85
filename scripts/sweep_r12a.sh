#!/bin/bash
# Round-5 chip queue, phase A — the timing-sensitive remainder of
# sweep_r11d (stage 5', the hopper state probe, already ran post-round-4:
# /tmp/probe_hopper_state2.log reached roll20=656 @187k with no NaN).
# Run these stages on a quiet host: the round-4 spill probe was
# contaminated by a concurrent CPU-side dryrun compile.
set -x
set -o pipefail
cd /root/repo
mkdir -p artifacts/sweeps/r12

# 6'. host-spill overhead, quiet chip, at the refresh=2 default.
for SPILL in none host; do
  rm -rf runs/spill_probe_$SPILL
  timeout 2400 python -m sgqn_carla_tpu.train.train \
    --algorithm sgsac --domain_name walker --task_name walk --seed 11 \
    --train_steps 8k --num_envs 1 --replay_spill $SPILL \
    --replay_device_capacity 4000 --eval_mode none \
    --log_dir runs/spill_probe_$SPILL \
    2>&1 | tee artifacts/sweeps/r12/spill_probe_$SPILL.log | tail -3 \
    || echo "SPILL $SPILL rc=$?"
done

# 7'. bench env-batch re-sweep (unpacked learner default).
for E in 2048 1536 1024 768; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=100 timeout 1800 python bench.py \
    2>&1 | tee -a artifacts/sweeps/r12/bench_sweep.log || echo "BENCH $E rc=$?"
done

# 8'. env-step bound certification.
timeout 2400 python scripts/bound_env_step.py 1024 200 \
  2>&1 | tee artifacts/sweeps/r12/bound_env_step.json || echo "BOUND rc=$?"

echo "=== SWEEP R12A DONE ==="
