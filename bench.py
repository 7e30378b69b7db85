"""Benchmark harness: vectorized env-steps/sec/chip at 84×84 pixels.

Measures the full pixel-env hot path — physics (action_repeat × n_sub_steps
substeps) → ray-cast render → frame stack — for walker-walk, `vmap`-ped over
a batch of envs on one chip, matching the BASELINE.md headline metric
(north star: ≥1M env-steps/sec/chip on v5p; the reference steps ONE env on
CPU+GL at roughly 10²–10³ steps/sec).

Hardened per round-1 VERDICT weak #7/#8:
  * rollouts use per-step RANDOM actions (a zero-action walker settles into
    a pile and under-exercises the contact/solver branches);
  * the same JSON line also reports learner updates/s for the SGQN update
    at batch 128 — the actual wall-clock bound of full training runs
    (docs/PERF.md: ~14 ms/update dominates the fused chunk);
  * BENCH_MESH_DATA_AXIS=N shards the env batch over an N-device data mesh
    (`parallel/mesh.py`) so multi-chip scaling is measurable the day >1
    chip is attached; per-chip throughput is reported either way.

The rollout is fused with `lax.scan` (one XLA program, one dispatch) and
synced by materializing the summed reward on the host, so the number is
true device throughput — not async-dispatch latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
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


def _make_mesh(data_axis: int):
    if data_axis <= 1:
        return None
    from sgqn_carla_tpu import parallel as par

    return par.make_mesh(par.MeshSpec(data=data_axis))


def bench_env_steps(num_envs: int, inner: int, reps: int,
                    mesh_axis: int) -> float:
    from sgqn_carla_tpu.envs import make_env
    from sgqn_carla_tpu.envs.vector import VectorEnv

    env = make_env("walker", "walk", image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, num_envs)
    states, _ = venv.reset(jax.random.PRNGKey(0))
    mesh = _make_mesh(mesh_axis)
    if mesh is not None:
        from sgqn_carla_tpu import parallel as par

        states = par.put_env_batch(states, mesh, num_envs)

    @jax.jit
    def rollout(states, rng):
        def body(carry, _):
            s, rng = carry
            rng, k = jax.random.split(rng)
            # random actions: keep contact/solver branches hot — a constant
            # action leaves the walker in a settled pile (VERDICT weak #7)
            actions = jax.random.uniform(
                k, (num_envs, env.action_size), jnp.float32, -1.0, 1.0)
            s, res = venv.step(s, actions)
            return (s, rng), res.reward.sum()

        (states, rng), rs = jax.lax.scan(
            body, (states, rng), None, length=inner)
        return states, rng, rs.sum()

    rng = jax.random.PRNGKey(1)
    states, rng, r = rollout(states, rng)  # compile + warmup
    _ = float(r)                           # hard host sync

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        states, rng, r = rollout(states, rng)
        _ = float(r)
        dt = time.perf_counter() - t0
        best = max(best, num_envs * inner / dt)
    return best


def bench_updates(batch_size: int, inner: int, reps: int,
                  algorithm: str = "sgsac") -> float:
    """Learner updates/s: the SGQN update (critic + guided-backprop
    attribution + consistency + actor/alpha + aux BCE cadence) at the
    reference batch size, against a randomized replay ring."""
    from sgqn_carla_tpu.agents import make_agent
    from sgqn_carla_tpu.core.config import Config
    from sgqn_carla_tpu.data.replay import ReplayBuffer

    cfg = Config(domain_name="walker", task_name="walk",
                 algorithm=algorithm, batch_size=batch_size).finalize()
    agent = make_agent((9, 84, 84), (6,), cfg)
    astate = agent.init_state(jax.random.PRNGKey(0))

    buffer = ReplayBuffer(num_envs=8, episode_len=250, capacity=16_000,
                          image_size=84, action_size=6,
                          batch_size=batch_size)
    rstate = buffer.init()
    rnp = np.random.RandomState(0)
    rstate = rstate.replace(
        frames=jnp.asarray(rnp.randint(
            0, 256, rstate.frames.shape, np.uint8)),
        actions=jnp.asarray(rnp.uniform(
            -1, 1, rstate.actions.shape).astype(np.float32)),
        rewards=jnp.asarray(rnp.uniform(
            0, 1, rstate.rewards.shape).astype(np.float32)),
        num_eps=jnp.int32(buffer.num_episodes),
        ep_counter=jnp.int32(buffer.num_episodes),
    )

    @jax.jit
    def run(astate, rstate):
        # rstate is an ARGUMENT, not a closure capture: a captured ring
        # would be baked into the program as a ~340 MB literal and blow the
        # remote-compile request size limit
        def body(a, _):
            a, m = agent._update(a, rstate, buffer)
            return a, m["critic_loss"]

        astate, losses = jax.lax.scan(body, astate, None, length=inner)
        return astate, losses.sum()

    astate, l = run(astate, rstate)
    _ = float(l)

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        astate, l = run(astate, rstate)
        _ = float(l)
        dt = time.perf_counter() - t0
        best = max(best, inner / dt)
    return best


def main():
    # 768 = the round-5 re-sweep's sweet spot on the unpacked-learner
    # program family (two consistent runs at ~322k env-steps/s vs 310k at
    # 1024, 292k at 640, 273k at 512, ~300k at 1536/2048 —
    # artifacts/sweeps/r12/bench_sweep.log)
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "768"))
    # 200 scan iterations per dispatch: the axon-tunnel runtime charges a
    # fixed ~26 ms dispatch overhead to programs launched after a render
    # program has run once (measured; independent of program content), so
    # throughput must be read off a long-enough fused rollout — exactly how
    # the production trainer runs (train/loop.py fused chunks).
    inner = int(os.environ.get("BENCH_INNER", "200"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    mesh_axis = int(os.environ.get("BENCH_MESH_DATA_AXIS", "1"))
    upd_inner = int(os.environ.get("BENCH_UPD_INNER", "100"))
    sps = bench_env_steps(num_envs, inner, reps, mesh_axis)
    ups = bench_updates(128, upd_inner, reps)
    print(json.dumps({
        "metric": "vectorized_env_steps_per_sec_per_chip_84px",
        "value": round(sps / max(mesh_axis, 1), 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / max(mesh_axis, 1) / 1_000_000, 4),
        "actions": "random",
        "mesh_data_axis": mesh_axis,
        "sgsac_updates_per_sec_b128": round(ups, 1),
    }))


if __name__ == "__main__":
    main()
