"""Benchmark harness: vectorized env-steps/sec/chip at 84×84 pixels.

Measures the full pixel-env hot path — physics (action_repeat × n_sub_steps
substeps) → ray-cast render → frame stack — for walker-walk, `vmap`-ped over
a batch of envs on one chip, matching the BASELINE.md headline metric
(north star: ≥1M env-steps/sec/chip on v5p; the reference steps ONE env on
CPU+GL at roughly 10²–10³ steps/sec).

The rollout is fused with `lax.scan` (one XLA program, one dispatch) and
synced by materializing the summed reward on the host, so the number is
true device throughput — not async-dispatch latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
`vs_baseline` is value / 1e6 (the BASELINE.json north-star target; the
reference repo publishes no machine-readable numbers to normalize against).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the rollout program is large and the remote
# compile path is slow; a warm cache turns the ~5 min first compile into
# seconds on repeat runs in the same container.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def bench_env_steps(num_envs: int, inner: int, reps: int) -> float:
    from sgqn_carla_tpu.envs import make_env
    from sgqn_carla_tpu.envs.vector import VectorEnv

    env = make_env("walker", "walk", image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, num_envs)
    states, _ = venv.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, env.action_size), jnp.float32)

    @jax.jit
    def rollout(states):
        def body(s, _):
            s, res = venv.step(s, actions)
            return s, res.reward.sum()

        states, rs = jax.lax.scan(body, states, None, length=inner)
        return states, rs.sum()

    states, r = rollout(states)  # compile + warmup
    _ = float(r)                 # hard host sync

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        states, r = rollout(states)
        _ = float(r)
        dt = time.perf_counter() - t0
        best = max(best, num_envs * inner / dt)
    return best


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "1024"))
    # 200 scan iterations per dispatch: the axon-tunnel runtime charges a
    # fixed ~26 ms dispatch overhead to programs launched after a render
    # program has run once (measured; independent of program content), so
    # throughput must be read off a long-enough fused rollout — exactly how
    # the production trainer runs (train/loop.py fused chunks).
    inner = int(os.environ.get("BENCH_INNER", "200"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    sps = bench_env_steps(num_envs, inner, reps)
    print(json.dumps({
        "metric": "vectorized_env_steps_per_sec_per_chip_84px",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
