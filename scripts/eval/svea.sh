#!/bin/sh
# reference: scripts/eval/svea.sh
python -m sgqn_carla_tpu.train.eval \
	--algorithm svea \
	--eval_episodes 100 \
	--seed 0
