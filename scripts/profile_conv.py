"""MXU-utilization microbenchmark for the trunk's conv shape.

Hypothesis (docs/PERF.md learner section): the SGQN update is bound by
3x3 convs with Cout=32 — only 32 of the MXU's 128 output lanes are used,
so each conv runs at ~25% of peak regardless of batch. This times the
exact trunk conv shape at Cout in {32, 64, 128} and both precisions; if
ms scales sub-linearly with Cout, the lane-ceiling hypothesis is
confirmed and conv-count reduction (not tiling) is the only lever.

Usage: python scripts/profile_conv.py [batch] [spatial] [inner]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def time_conv(batch, spatial, cin, cout, dtype, inner):
    x = jnp.asarray(np.random.RandomState(0).randn(batch, spatial, spatial,
                                                   cin), dtype)
    w = jnp.asarray(np.random.RandomState(1).randn(3, 3, cin, cout) * 0.05,
                    dtype)

    @jax.jit
    def run(x, w, seed):
        def body(xc, _):
            # SAME padding keeps shapes so the conv output feeds the next
            # iteration's input through a full-image carry
            y = jax.lax.conv_general_dilated(
                xc, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            m = y.mean(axis=-1, keepdims=True).astype(dtype)
            return xc + m * 1e-6, None
        xc, _ = jax.lax.scan(body, x + seed.astype(dtype), None, length=inner)
        return xc.mean()

    # the axon runtime memoizes identical executions (same program + same
    # inputs returns the cached result — the reason bench.py feeds random
    # actions), so every timed call gets a distinct seed operand
    _ = float(run(x, w, jnp.float32(0)))   # hard host sync (bench.py:95 —
    best = float("inf")                    # block_until_ready is NOT a real
    for r in range(1, 4):                  # barrier on the axon runtime)
        t0 = time.perf_counter()
        _ = float(run(x, w, jnp.float32(r)))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * batch * spatial ** 2 * 9 * cin * cout
    ms = 1e3 * best / inner
    return ms, flops / (best / inner) / 1e12


def time_grouped(batch, spatial, groups, dtype, inner):
    """`groups` independent 32→32 conv paths packed channel-wise into one
    grouped conv (feature_group_count) — the candidate lever for the
    SGQN update's 4 same-shape trunk forwards (obs/masked/next×online,
    next×target). If this runs at ~the cost of ONE 32→32 conv, the MXU
    lane-packing works; if at ~`groups`×, XLA lowers it as separate
    convs and the idea is dead."""
    cin, cout = 32 * groups, 32 * groups
    x = jnp.asarray(np.random.RandomState(0).randn(batch, spatial, spatial,
                                                   cin), dtype)
    w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 32, cout) * 0.05,
                    dtype)

    @jax.jit
    def run(x, w, seed):
        def body(xc, _):
            y = jax.lax.conv_general_dilated(
                xc, w, (1, 1), "SAME",
                feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            m = y.mean(axis=-1, keepdims=True).astype(dtype)
            return xc + m * 1e-6, None
        xc, _ = jax.lax.scan(body, x + seed.astype(dtype), None, length=inner)
        return xc.mean()

    _ = float(run(x, w, jnp.float32(0)))
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        _ = float(run(x, w, jnp.float32(r)))
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best / inner


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spatial = int(sys.argv[2]) if len(sys.argv) > 2 else 39
    inner = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    rows = []
    for dtype in (jnp.bfloat16, jnp.float32):
        for cout in (32, 64, 128):
            ms, tf = time_conv(batch, spatial, 32, cout, dtype, inner)
            rows.append({"dtype": dtype.__name__, "cin": 32, "cout": cout,
                         "ms": round(ms, 4), "tflops": round(tf, 2)})
    for groups in (2, 4):
        ms = time_grouped(batch, spatial, groups, jnp.bfloat16, inner)
        rows.append({"dtype": "bfloat16", "grouped": groups,
                     "ms": round(ms, 4)})
    print(json.dumps({"batch": batch, "spatial": spatial, "rows": rows}))


if __name__ == "__main__":
    main()
