#!/bin/bash
# Round-5 phase A2: QUIET rerun of the spill A/B (the phase-A probes were
# contaminated by a concurrent CPU-bound pytest run — same failure mode as
# round 4's first attempt). All programs are warm in the XLA cache now, so
# each probe is ~5 min; run with NOTHING else on the host.
set -x
set -o pipefail
cd /root/repo
for SPILL in none host; do
  rm -rf runs/spill_probe_$SPILL
  timeout 2400 python -m sgqn_carla_tpu.train.train \
    --algorithm sgsac --domain_name walker --task_name walk --seed 11 \
    --train_steps 8k --num_envs 1 --replay_spill $SPILL \
    --replay_device_capacity 4000 --eval_mode none \
    --log_dir runs/spill_probe_$SPILL \
    2>&1 | tee artifacts/sweeps/r12/spill_probe_${SPILL}_quiet.log | tail -2 \
    || echo "SPILL $SPILL rc=$?"
done
echo "=== SWEEP R12A2 DONE ==="
