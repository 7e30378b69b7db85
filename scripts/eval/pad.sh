#!/bin/sh
# reference: scripts/eval/pad.sh
python -m sgqn_carla_tpu.train.eval \
	--algorithm pad \
	--num_shared_layers 8 \
	--num_head_layers 3 \
	--eval_episodes 100 \
	--seed 0
