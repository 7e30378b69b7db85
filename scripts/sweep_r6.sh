#!/bin/bash
# Round-2 continuation sweep: runs after the flag_r2c flagship finishes.
#  1. Offline evals of flag_r2c checkpoints on video_hard (the north-star
#     surface), then the full mode table for the best checkpoint.
#  2. hopper-stand DrQ with the implicit-contact stiction fix (dfcd59c):
#     the learnability test the probes cannot substitute for.
#  3. Env-batch re-sweep of bench.py with the round-2 renderer+physics
#     (the round-1 sweep predates both; docs/PERF.md records 1024 as the
#     old sweet spot).
set -x
cd /root/repo

# ---- wait for the flagship training process to exit
if [ -f /tmp/flag_r2c.pid ]; then
  while kill -0 "$(cat /tmp/flag_r2c.pid)" 2>/dev/null; do sleep 60; done
fi

FLAG="--algorithm sgsac --domain_name walker --task_name walk --seed 1 --log_dir runs/flag_r2c"
WD=runs/flag_r2c/walker_walk/sgsac/1

oev() {  # offline eval: <ckpt> <mode> [extra]
  ck=$1; mode=$2; shift 2
  timeout 2400 python -m sgqn_carla_tpu.train.eval $FLAG --train_steps "$ck" \
    --eval_mode "$mode" --eval_episodes 8 "$@" || echo "EVAL $ck $mode FAILED rc=$?"
  for f in "$WD"/eval_${mode}*.json; do
    [ -f "$f" ] && cp "$f" "${f%.json}_${ck}.json"
  done
}

oev 250k video_hard
oev 225k video_hard
oev 200k video_hard
oev 175k video_hard
# full table for the terminal checkpoint (per-episode payloads included)
oev 250k train
oev 250k video_easy
oev 250k color_hard

# ---- hopper-stand DrQ: does the stiction fix make it learn?
timeout 7200 python -m sgqn_carla_tpu.train.train \
  --domain_name hopper --task_name stand --algorithm drq --train_steps 150k \
  --init_steps 1000 --eval_mode none --num_envs 8 --save_freq 25k --seed 0 \
  --log_dir runs/hopper_r2 || echo "HOPPER FAILED rc=$?"

# ---- env-batch re-sweep with the current renderer+physics
for E in 1536 2048 1024; do
  BENCH_NUM_ENVS=$E BENCH_UPD_INNER=20 timeout 3600 python bench.py \
    | tee -a /tmp/bench_sweep_r2.log
done

echo "=== SWEEP R6 DONE ==="
