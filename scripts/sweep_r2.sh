#!/bin/bash
# Round-2 benchmark sweep: the BASELINE.md configs not yet covered by artifacts.
# Sequential on the one tunneled TPU chip; each run bounded by timeout.
set -x
cd /root/repo
COMMON="--train_steps 100k --init_steps 1000 --num_envs 8 --eval_freq 25k --eval_episodes 4 --save_freq 50k --seed 0"

run() {  # run <tag> <args...>
  tag=$1; shift
  echo "=== RUN $tag: $* ==="
  timeout 5400 python -m sgqn_carla_tpu.train.train "$@" || echo "RUN $tag FAILED rc=$?"
}
oev() {  # offline eval: <mode> <args...>
  mode=$1; shift
  timeout 1800 python -m sgqn_carla_tpu.train.eval "$@" --eval_mode "$mode" --eval_episodes 8 || echo "EVAL $mode $* FAILED rc=$?"
}

# 1-4: SGQN across the DMCGB suite (video_hard periodic; color_hard/video_easy offline)
run sgsac_bic   --algorithm sgsac --domain_name ball_in_cup --task_name catch  --eval_mode video_hard $COMMON
oev color_hard  --algorithm sgsac --domain_name ball_in_cup --task_name catch --train_steps 100k --seed 0
oev video_easy  --algorithm sgsac --domain_name ball_in_cup --task_name catch --train_steps 100k --seed 0

run sgsac_finger --algorithm sgsac --domain_name finger --task_name spin --eval_mode video_hard $COMMON
oev color_hard   --algorithm sgsac --domain_name finger --task_name spin --train_steps 100k --seed 0
oev video_easy   --algorithm sgsac --domain_name finger --task_name spin --train_steps 100k --seed 0

run sgsac_cartpole --algorithm sgsac --domain_name cartpole --task_name swingup --sgqn_quantile 0.98 --eval_mode video_hard $COMMON
oev color_hard     --algorithm sgsac --domain_name cartpole --task_name swingup --sgqn_quantile 0.98 --train_steps 100k --seed 0
oev video_easy     --algorithm sgsac --domain_name cartpole --task_name swingup --sgqn_quantile 0.98 --train_steps 100k --seed 0

run sgsac_wstand --algorithm sgsac --domain_name walker --task_name stand --eval_mode video_hard $COMMON
oev color_hard   --algorithm sgsac --domain_name walker --task_name stand --train_steps 100k --seed 0
oev video_easy   --algorithm sgsac --domain_name walker --task_name stand --train_steps 100k --seed 0

# 5: SAC-from-pixels walker-walk (BASELINE config; train curve is the point)
run sac_wwalk --algorithm sac --domain_name walker --task_name walk --eval_mode none $COMMON
oev color_easy --algorithm sac --domain_name walker --task_name walk --train_steps 100k --seed 0
oev video_easy --algorithm sac --domain_name walker --task_name walk --train_steps 100k --seed 0

# 6: SVEA walker under color_hard (video_easy covered by round-1 artifact; re-eval this ckpt anyway)
run svea_wwalk --algorithm svea --domain_name walker --task_name walk --eval_mode color_hard $COMMON
oev video_easy --algorithm svea --domain_name walker --task_name walk --train_steps 100k --seed 0
oev video_hard --algorithm svea --domain_name walker --task_name walk --train_steps 100k --seed 0

# 7: SODA walker under video_easy (+ color_hard offline)
run soda_wwalk --algorithm soda --domain_name walker --task_name walk --eval_mode video_easy $COMMON
oev color_hard --algorithm soda --domain_name walker --task_name walk --train_steps 100k --seed 0

echo "=== SWEEP DONE ==="
