#!/bin/sh
# reference: scripts/eval/curl.sh
python -m sgqn_carla_tpu.train.eval \
	--algorithm curl \
	--eval_episodes 100 \
	--seed 0
