#!/bin/sh
# reference: scripts/svea.sh
python -m sgqn_carla_tpu.train.train \
	--algorithm svea \
	--seed 0
