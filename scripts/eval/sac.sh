#!/bin/sh
# reference: scripts/eval/sac.sh
python -m sgqn_carla_tpu.train.eval \
	--algorithm sac \
	--eval_episodes 100 \
	--seed 0
