#!/bin/bash
# Multi-chip SCALING row on the virtual 8-device CPU mesh (round-4 verdict
# item #6: BENCH has only ever recorded mesh_data_axis=1).
#
# One real chip is all the tunnel exposes, so true multi-chip speedup is
# unmeasurable here; what IS measurable on the virtual mesh is the SPMD
# partition overhead: axis=8 shards the same global env batch over 8
# logical devices that share one physical core, so
#   throughput(axis=8) / throughput(axis=1)  ≈  1 / (1 + overhead)
# — any collective/partition cost shows up as a ratio below 1. The
# per-chip-normalized efficiency on real hardware is bounded below by
# this ratio (ICI collectives on silicon are faster than emulated ones).
#
# The container pins jax_platforms="axon,cpu" in sitecustomize, so the
# runner re-pins cpu via jax.config before backend init (CLAUDE.md).
set -x
set -o pipefail
cd /root/repo
mkdir -p artifacts/sweeps/r12

for AX in 1 8; do
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  BENCH_MESH_DATA_AXIS=$AX BENCH_NUM_ENVS=128 BENCH_INNER=25 \
  BENCH_REPS=2 BENCH_UPD_INNER=2 \
  timeout 3600 python -c "
import jax, runpy
jax.config.update('jax_platforms', 'cpu')
runpy.run_path('bench.py', run_name='__main__')
" 2>&1 | tail -2 | tee -a artifacts/sweeps/r12/mesh_scaling_cpu.log \
    || echo "MESH_BENCH ax=$AX rc=$?"
done
echo "=== MESH SCALING DONE ==="
