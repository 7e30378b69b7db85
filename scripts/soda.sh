#!/bin/sh
# reference: scripts/soda.sh
python -m sgqn_carla_tpu.train.train \
	--algorithm soda \
	--aux_lr 3e-4 \
	--seed 0
