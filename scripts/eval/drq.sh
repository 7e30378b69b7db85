#!/bin/sh
# reference: scripts/eval/drq.sh
python -m sgqn_carla_tpu.train.eval \
	--algorithm drq \
	--eval_episodes 100 \
	--seed 0
