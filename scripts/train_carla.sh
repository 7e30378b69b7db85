#!/bin/sh
# CARLA training on the JAX twin. The reference needs two UE4 servers
# (scripts/start_carla_servers.sh, ports 2000/2003); the twin replaces the
# servers with a batch axis, so there is nothing to launch — this script is
# the whole "start servers + train" flow.
python -m sgqn_carla_tpu.train.train_carla \
	--algorithm sgsac \
	--seed 0
