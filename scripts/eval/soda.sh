#!/bin/sh
# reference: scripts/eval/soda.sh
python -m sgqn_carla_tpu.train.eval \
	--algorithm soda \
	--eval_episodes 100 \
	--seed 0
