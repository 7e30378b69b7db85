"""Certify the env-step throughput against the VPU issue bound (round-3
verdict item #7: formalize docs/PERF.md's "within ~25% of the analytic
op-count bound" into a reproducible artifact).

Method — three measurements, one JSON verdict:

1. **Op count**: compile the FULL fused env step (physics × action_repeat
   substeps + ray-cast render + frame stack, exactly `VectorEnv.step`) on
   the CPU backend and histogram the optimized HLO (CSE/DCE applied —
   the honest proxy for issue count; same method as count_hlo_ops.py).
   Elementwise/compare/select/fma instructions on (B,·)-shaped operands
   are the VPU issue work; scalars and layout ops are excluded.
2. **VPU rate calibration**: time a pure fused elementwise chain (mul-add
   -select over a (B, P) array, lax.scan-fused) on the ACTUAL backend —
   this measures achievable op-units/s for exactly the instruction mix
   the step is made of, on this chip, today.
3. **Measured throughput**: the bench rollout (random actions, scan
   -fused, hard host sync) — same protocol as bench.py.

ratio = measured / bound. A ratio near 1.0 certifies the formulation is
at the hardware's issue ceiling; the residual (1 − ratio) is the honest
remaining headroom.

Usage: python scripts/bound_env_step.py [num_envs] [inner]
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# VPU-issue instruction classes (elementwise lanes); excluded: reshapes/
# transposes/broadcasts (layout, often free after fusion), constants,
# parameter/tuple plumbing, reductions counted separately below.
_VPU_OPS = {
    "add", "subtract", "multiply", "divide", "minimum", "maximum",
    "compare", "select", "and", "or", "not", "xor", "abs", "negate",
    "sign", "floor", "ceil", "round-nearest-afz", "round-nearest-even",
    "clamp", "power", "sqrt", "rsqrt", "exponential", "log", "tanh",
    "sine", "cosine", "atan2", "convert", "clz", "popcnt",
    "shift-left", "shift-right-logical", "shift-right-arithmetic",
    "remainder",
}

_SHAPE_RE = re.compile(r"(\w[\w-]*)\(")
_DIMS_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8}


def count_step_ops(num_envs: int):
    """Optimized-HLO accounting for ONE env step-batch on (num_envs,):

    * VPU op-units: every elementwise/compare/select element produced,
      anywhere (fusion bodies included — fused elements still issue);
    * materialized bytes: result bytes of ENTRY-computation instructions
      only. CAUTION: this is a property of the CPU-optimized program —
      XLA:CPU fuses far less aggressively than XLA:TPU (measured 0.92 MB
      per env-step here vs ~23 kB/env-step from the TPU program's own
      cost_analysis), so it must NOT feed a TPU bandwidth bound; the TPU
      bound uses tpu_step_cost() below. Kept for the CPU-vs-TPU fusion
      diagnostic only.
    """
    from sgqn_carla_tpu.envs import make_env
    from sgqn_carla_tpu.envs.vector import VectorEnv

    env = make_env("walker", "walk", image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, num_envs)
    # count on the CPU backend: CSE/DCE are platform-independent passes
    # (same rationale as count_hlo_ops.py) and counting must not compile a
    # throwaway program on the chip
    with jax.default_device(jax.devices("cpu")[0]):
        states, _ = venv.reset(jax.random.PRNGKey(0))
        actions = jnp.zeros((num_envs, env.action_size), jnp.float32)
        lowered = jax.jit(venv.step).lower(states, actions)
        hlo = lowered.compile().as_text()

    total = 0
    per_op = {}
    entry_bytes = 0
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        line = line.strip()
        if "=" not in line:
            continue
        rhs = line.split("=", 1)[1].strip()
        # result dtype/shape prefix e.g. f32[1024,84,84]{...} op-name(
        m = _DIMS_RE.match(rhs)
        if not m:
            continue
        dtype, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        om = _SHAPE_RE.search(rhs)
        if not om:
            continue
        op = om.group(1)
        if in_entry and op not in ("parameter", "constant", "tuple",
                                   "get-tuple-element", "bitcast"):
            entry_bytes += n * _DTYPE_BYTES.get(dtype, 4)
        if op in _VPU_OPS:
            total += n
            per_op[op] = per_op.get(op, 0) + n
        elif op == "fusion":
            # fusion nodes re-list their body ops on following lines in
            # the optimized dump — the bodies are already counted.
            continue
    top = dict(sorted(per_op.items(), key=lambda kv: -kv[1])[:8])
    return total, top, entry_bytes


def calibrate_vpu(inner: int = 64, size: int = 4 << 20, length: int = 32,
                  reps: int = 5):
    """Achievable elementwise op-units/s for the step's instruction mix.

    The kernel is a scan over UNROLLED fused mul-add-compare-select rounds
    (5 op-units each; 320 ops per element per scan iteration = 40 op/byte
    arithmetic intensity, far above the issue/bandwidth crossover, so the
    kernel is ISSUE-bound — a bare scan body of one round measures HBM
    bandwidth instead: 0.29 T/s vs ~2.5 T/s fused, round-3 note).

    Timed as the DIFFERENCE between a length-L and a length-2L scan: the
    axon runtime charges a fixed ~26 ms dispatch overhead per program
    (docs/PERF.md), which at any feasible single-dispatch chain size is
    comparable to the arithmetic itself — the round-4 single-dispatch
    version of this calibrator measured 0.05 T/s, i.e. it measured the
    dispatch, not the VPU (BENCH_r04-era bound_env_step run, 29x below
    the rollout's own throughput). Two lengths, identical program shape,
    distinct operands per call (the runtime memoizes repeated identical
    executions): rate = extra_ops / extra_time, dispatch cancels."""
    x = jnp.linspace(0.0, 1.0, size, dtype=jnp.float32)

    def rounds(y):
        for _ in range(inner):
            y = y * 1.000001 + 0.5                  # 2 ops
            y = jnp.where(y > 1.0, y - 0.75, y)     # compare+select+sub
        return y

    def make(n_iters):
        @jax.jit
        def chain(x, s):
            y, _ = jax.lax.scan(lambda y, _: (rounds(y), None), x + s,
                                None, length=n_iters)
            return y.sum()
        return chain

    f1, f2 = make(length), make(2 * length)
    _ = float(f1(x, jnp.float32(0.0)))   # compile + warmup
    _ = float(f2(x, jnp.float32(0.0)))

    def best_time(f):
        best = float("inf")
        for i in range(reps):
            s = jnp.float32(1e-4 + i * 1e-3)  # distinct operands: no memo
            t0 = time.perf_counter()
            _ = float(f(x, s))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = best_time(f1), best_time(f2)
    extra_ops = 5 * inner * size * length
    return extra_ops / max(t2 - t1, 1e-9)


def measured_steps(num_envs: int, inner: int):
    import bench

    return bench.bench_env_steps(num_envs, inner, reps=3, mesh_axis=1)


def tpu_step_cost(num_envs: int):
    """XLA's own cost model for the TPU-compiled step: bytes accessed +
    flops + transcendentals per step-batch (the post-fusion TPU program —
    the only traffic number a TPU bandwidth bound may use)."""
    from sgqn_carla_tpu.envs import make_env
    from sgqn_carla_tpu.envs.vector import VectorEnv

    env = make_env("walker", "walk", image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, num_envs)
    states, _ = venv.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, env.action_size), jnp.float32)
    ca = jax.jit(venv.step).lower(states, actions).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {k: float(ca.get(k, 0.0))
            for k in ("bytes accessed", "flops", "transcendentals")}


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    # ops are counted at a smaller batch (CPU compile of the B=1024 program
    # is minutes-slow; every VPU-class op in the step scales linearly in B,
    # so per-env op-units are batch-invariant up to the tiny B-independent
    # per-geom precompute, which only makes the bound conservative)
    count_envs = int(os.environ.get("BOUND_COUNT_ENVS", "128"))

    ops, top, ebytes = count_step_ops(count_envs)
    rate = calibrate_vpu()
    sps = measured_steps(num_envs, inner)
    cost = tpu_step_cost(num_envs)
    issue_bound = rate / (ops / count_envs)  # env-steps/s, VPU issue ceiling
    # HBM bandwidth ceiling from the TPU program's own cost model.
    # v5e HBM2 ≈ 819 GB/s (public spec); override for other chips.
    hbm_bw = float(os.environ.get("BOUND_HBM_GBPS", "819")) * 1e9
    bw_bound = hbm_bw / max(cost["bytes accessed"] / num_envs, 1e-9)
    bound = min(issue_bound, bw_bound)
    out = {
        "num_envs": num_envs,
        "count_envs": count_envs,
        "hlo_vpu_op_units_per_count_batch": ops,
        "op_units_per_env_step": round(ops / count_envs, 1),
        "top_ops": top,
        "cpu_hlo_materialized_bytes_per_env_step": round(
            ebytes / count_envs, 1),
        "tpu_cost_analysis_per_env_step": {
            k: round(v / num_envs, 1) for k, v in cost.items()},
        "calibrated_vpu_op_units_per_s": round(rate, 0),
        "issue_bound_env_steps_per_s": round(issue_bound, 0),
        "bandwidth_bound_env_steps_per_s": round(bw_bound, 0),
        "bound_env_steps_per_s": round(bound, 0),
        "binding_side": ("bandwidth" if bw_bound < issue_bound else "issue"),
        "measured_env_steps_per_s": round(sps, 0),
        "measured_over_bound": round(sps / bound, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
