#!/bin/sh
# reference: scripts/eval/rad.sh
python -m sgqn_carla_tpu.train.eval \
	--algorithm rad \
	--eval_episodes 100 \
	--seed 0
