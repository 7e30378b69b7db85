#!/bin/sh
# reference: scripts/pad.sh
python -m sgqn_carla_tpu.train.train \
	--algorithm pad \
	--num_shared_layers 8 \
	--num_head_layers 3 \
	--seed 0
