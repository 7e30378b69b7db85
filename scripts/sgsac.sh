#!/bin/sh
# Canonical SGQN invocation (reference: scripts/sgsac.sh — CUDA device pin
# replaced by the TPU runtime; flags are 1:1 with the reference CLI)
python -m sgqn_carla_tpu.train.train \
	--algorithm sgsac \
	--seed 0 --eval_mode all --domain_name cartpole --task_name swingup --sgqn_quantile 0.98
