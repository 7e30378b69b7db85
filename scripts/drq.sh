#!/bin/sh
# reference: scripts/drq.sh
python -m sgqn_carla_tpu.train.train \
	--algorithm drq \
	--seed 0
