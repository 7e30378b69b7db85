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
    def run(x, w):
        def body(c, _):
            # the carry feeds the input so XLA cannot hoist the conv out
            # of the scan as loop-invariant
            y = jax.lax.conv_general_dilated(
                x + c.astype(dtype), w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.mean().astype(jnp.float32) * 1e-3, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return c

    out = run(x, w)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x, w))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * batch * (spatial - 2) ** 2 * 9 * cin * cout
    ms = 1e3 * best / inner
    return ms, flops / (best / inner) / 1e12


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
    print(json.dumps({"batch": batch, "spatial": spatial, "rows": rows}))


if __name__ == "__main__":
    main()
