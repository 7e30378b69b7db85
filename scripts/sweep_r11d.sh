#!/bin/bash
# Round-4 chip queue, phase D — quiet-window remainder:
#   hopper state probe rerun (probe hardened with grad-clip + Q bound
#   after the 27.75k NaN), spill probes rerun (first attempt was
#   contaminated by a concurrent CPU-side dryrun compile), bench
#   env-batch sweep, env-step bound certification.
set -x
set -o pipefail
cd /root/repo

# 5'. hopper state probe (hardened).
timeout 3600 python scripts/probe_state_sac.py hopper stand 200000 0 \
  | tee /tmp/probe_hopper_state2.log | tail -3 || echo "HPROBE rc=$?"

# 6'. host-spill overhead, quiet chip (programs now cached → fast).
for SPILL in none host; do
  rm -rf runs/spill_probe_$SPILL
  timeout 2400 python -m sgqn_carla_tpu.train.train \
    --algorithm sgsac --domain_name walker --task_name walk --seed 11 \
    --train_steps 8k --num_envs 1 --replay_spill $SPILL \
    --replay_device_capacity 4000 --eval_mode none \
    --log_dir runs/spill_probe_$SPILL || echo "SPILL $SPILL rc=$?"
done

# 7'. bench env-batch re-sweep (unpacked learner default).
for E in 2048 1536 1024 768; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=100 timeout 1800 python bench.py \
    | tee -a /tmp/bench_sweep_r11.log || echo "BENCH $E rc=$?"
done

# 8'. env-step bound certification.
timeout 2400 python scripts/bound_env_step.py 1024 200 \
  | tee /tmp/bound_env_step.json || echo "BOUND rc=$?"

echo "=== SWEEP R11D DONE ==="
