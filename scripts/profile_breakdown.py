"""Per-phase throughput breakdown of the env-step hot path.

Round-1 VERDICT weak #2: the headline bench measured only the fused env
step with no split of physics vs render vs frame-stack. This script times
each phase separately (same vmapped batch, same lax.scan fusion, hard host
sync) so optimization effort lands on the dominant term.

Usage:  python scripts/profile_breakdown.py [num_envs] [inner]
Prints one JSON object with env-steps/s for: full step, physics-only,
render-only, and the implied render share.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from sgqn_carla_tpu.envs import make_env
    from sgqn_carla_tpu.envs.vector import VectorEnv
    from sgqn_carla_tpu.physics import engine
    from sgqn_carla_tpu.render.cameras import camera_pose
    from sgqn_carla_tpu.render.raster import render_scene

    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    env = make_env("walker", "walk", image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, num_envs)
    states, _ = venv.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, env.action_size), jnp.float32)
    task = env.task

    # ---- full env step (physics + render + stack). NOTE: the body must
    # keep the obs live (fold into the reduction) — returning only rewards
    # lets XLA dead-code-eliminate the entire render from the scan carry.
    @jax.jit
    def full(states):
        def body(s, _):
            s, res = venv.step(s, actions)
            return s, res.reward.sum() + res.obs.astype(jnp.int32).sum()
        states, rs = jax.lax.scan(body, states, None, length=inner)
        return rs.sum()

    t_full = timeit(full, states)

    # ---- physics only (action_repeat control steps, no render)
    @jax.jit
    def phys_only(phys):
        def body(p, _):
            def rb(pp, _):
                pp = jax.vmap(task.step, in_axes=(0, 0))(pp, actions)
                r = jax.vmap(task.reward, in_axes=(0, 0))(pp, actions)
                return pp, r.sum()
            p, rs = jax.lax.scan(rb, p, None, length=env.action_repeat)
            return p, rs.sum()
        phys, rs = jax.lax.scan(body, phys, None, length=inner)
        return rs.sum()

    t_phys = timeit(phys_only, states.phys)

    # ---- render only: re-render after a tiny qpos shift each iteration so
    # XLA cannot hoist the render out of the scan
    model = task.model
    app = jax.tree_util.tree_map(lambda x: x, states.appearance)

    def render_one(qpos, qvel):
        kin = engine.forward_kinematics(model, qpos, qvel)
        cam = camera_pose(model, task.camera_id, kin)
        Rg, pg = engine.geom_world(model, kin)
        rgb, _, _ = render_scene(model, Rg, pg,
                                 jax.tree_util.tree_map(lambda x: x[0], app)
                                 if app.geom_rgba.ndim == 3 else app,
                                 cam, 84, 84)
        return rgb

    @jax.jit
    def render_loop(qpos, qvel):
        def body(q, i):
            q = q + 1e-6 * (i + 1)
            rgb = jax.vmap(render_one, in_axes=(0, 0))(q, qvel)
            return q, rgb.astype(jnp.int32).sum()
        q, ss = jax.lax.scan(body, qpos, jnp.arange(inner))
        return ss.sum()

    t_render = timeit(render_loop, states.phys.qpos, states.phys.qvel)

    n = num_envs * inner
    out = {
        "num_envs": num_envs,
        "inner": inner,
        "full_env_steps_per_s": round(n / t_full, 1),
        "physics_only_steps_per_s": round(n / t_phys, 1),
        "render_only_steps_per_s": round(n / t_render, 1),
        "t_full_ms_per_step_batch": round(1e3 * t_full / inner, 3),
        "t_phys_ms": round(1e3 * t_phys / inner, 3),
        "t_render_ms": round(1e3 * t_render / inner, 3),
        "render_share_of_full": round((t_render / t_full), 3),
        "phys_share_of_full": round((t_phys / t_full), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
