#!/bin/sh
# reference: scripts/sac.sh
python -m sgqn_carla_tpu.train.train \
	--algorithm sac \
	--seed 0
