"""Benchmark harness: vectorized env-steps/sec/chip at 84×84 pixels.

Measures the full pixel-env hot path — physics (action_repeat × n_sub_steps
substeps) → ray-cast render → frame stack — for walker-walk, `vmap`-ped over
a batch of envs on one chip, matching the BASELINE.md headline metric
(north star: ≥1M env-steps/sec/chip; the reference steps ONE env on CPU+GL
at roughly 10²–10³ steps/sec).

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


def bench_env_steps(num_envs: int = 1024, iters: int = 30,
                    warmup: int = 3) -> float:
    from sgqn_carla_tpu.envs import make_env
    from sgqn_carla_tpu.envs.vector import VectorEnv

    env = make_env("walker", "walk", image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, num_envs)
    rng = jax.random.PRNGKey(0)
    states, obs = venv.reset(rng)
    actions = jnp.zeros((num_envs, env.action_size), jnp.float32)
    step = jax.jit(venv.step)

    for _ in range(warmup):
        states, res = step(states, actions)
    jax.block_until_ready(res.obs)

    t0 = time.perf_counter()
    for _ in range(iters):
        states, res = step(states, actions)
    jax.block_until_ready(res.obs)
    dt = time.perf_counter() - t0
    return num_envs * iters / dt


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    sps = bench_env_steps(num_envs, iters)
    print(json.dumps({
        "metric": "vectorized_env_steps_per_sec_per_chip_84px",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
