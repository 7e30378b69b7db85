#!/bin/bash
# Round-2 endgame sweep (replaces sweep_r6.sh: same content, re-prioritized
# and time-bounded so the chip is free when the driver's end-of-round
# bench.py fires).
#  1. flag_r2c offline evals — video_hard across checkpoints (north star #2),
#     then the full mode table for the terminal checkpoint.
#  2. bench.py env-batch re-sweep with the round-2 renderer+physics.
#  3. hopper-stand DrQ with the stiction fix (dfcd59c), bounded: whatever
#     learning signal fits in the remaining wall clock.
set -x
cd /root/repo

# ---- wait for the flagship training process to exit
if [ -f /tmp/flag_r2c.pid ]; then
  while kill -0 "$(cat /tmp/flag_r2c.pid)" 2>/dev/null; do sleep 30; done
fi

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 1 --log_dir runs/flag_r2c"
WD=runs/flag_r2c/walker_walk/sgsac/1

oev() {  # offline eval: <ckpt> <mode> [extra]
  ck=$1; mode=$2; shift 2
  timeout 1800 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps "$ck" \
    --eval_mode "$mode" --eval_episodes 8 "$@" || echo "EVAL $ck $mode FAILED rc=$?"
  for f in "$WD"/eval_${mode}*.json; do
    case "$f" in *_[0-9]*k.json) continue;; esac
    [ -f "$f" ] && cp "$f" "${f%.json}_${ck}.json"
  done
}

oev 250k video_hard
oev 225k video_hard
oev 200k video_hard
oev 175k video_hard
oev 250k train
oev 250k video_easy
oev 250k color_hard

# ---- env-batch re-sweep with the current renderer+physics
for E in 1536 1024 2048; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=20 timeout 1800 python bench.py \
    | tee -a /tmp/bench_sweep_r2.log
done

# ---- hopper-stand DrQ, bounded: the stiction-fix learnability test.
# Dynamic bound: the driver's end-of-round bench.py must find the chip
# free, so stop 10 min before the estimated round deadline (epoch below
# derived from PROGRESS.jsonl wall_s vs the ~12h round budget).
DEADLINE=1787182519
LEFT=$(( DEADLINE - 600 - $(date +%s) ))
if [ "$LEFT" -ge 600 ]; then
  [ "$LEFT" -gt 2400 ] && LEFT=2400
  timeout "$LEFT" python -m sgqn_carla_tpu.train.train \
    --domain_name hopper --task_name stand --algorithm drq --train_steps 100k \
    --init_steps 1000 --eval_mode none --num_envs 8 --save_freq 10k --seed 0 \
    --log_dir runs/hopper_r2 || echo "HOPPER ENDED rc=$?"
else
  echo "SKIP hopper: ${LEFT}s left before the round deadline"
fi

echo "=== SWEEP R7 DONE ==="
