#!/bin/sh
# reference: scripts/rad.sh
python -m sgqn_carla_tpu.train.train \
	--algorithm rad \
	--seed 0
