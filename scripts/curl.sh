#!/bin/sh
# reference: scripts/curl.sh
python -m sgqn_carla_tpu.train.train \
	--algorithm curl \
	--aux_update_freq 1 \
	--seed 0
