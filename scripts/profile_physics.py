"""Per-phase breakdown INSIDE the physics substep (round-2 throughput work).

docs/PERF.md's phase table splits render vs physics; this splits the
physics substep itself. Method: each variant is a (qpos, qvel) → (qpos',
qvel') map chained exactly like production (`engine.n_steps`' scan: 40
substeps per env step) with PER-ENV feedback only — a cross-batch scalar
reduction per iteration acts as a global barrier and floors every variant
at the same ~0.15 ms (the first version of this script measured exactly
that, not the phases).

Variants are cumulative prefixes of the substep chain, so consecutive
differences are phase costs:
  fk → +geoms/contacts → +mass → +bias → +actuation → full substep.

Usage: python scripts/profile_physics.py [num_envs] [inner]
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

    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    nsub = 40  # 4 control steps × 10 substeps per env step (walker)

    env = make_env("walker", "walk", image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, num_envs)
    states, _ = venv.reset(jax.random.PRNGKey(0))
    model = env.task.model
    anc = engine._ancestors(model)
    qpos0 = states.phys.qpos
    qvel0 = states.phys.qvel
    h = model.timestep
    ctrl1 = jnp.zeros((model.nu,), jnp.float32)

    def chain(sub_fn):
        """inner iterations × nsub substeps, per-env feedback only."""
        @jax.jit
        def run(qpos, qvel):
            def outer(carry, _):
                def body(c, _):
                    q, v = c
                    return sub_fn(q, v), 0.0
                (q, v), _ = jax.lax.scan(body, carry, None, length=nsub)
                return (q, v), 0.0
            (q, v), _ = jax.lax.scan(outer, (qpos, qvel), None, length=inner)
            return q.sum() + v.sum()
        return timeit(run, qpos0, qvel0)

    def wrap(f):
        return jax.vmap(engine.f32_matmuls(f), in_axes=(0, 0))

    # cumulative prefixes of the substep chain
    @wrap
    def v_fk(q, v):
        k = engine.forward_kinematics(model, q, v)
        fb = k.p.sum() + k.v.sum()
        return q + h * v + 1e-12 * fb, v

    @wrap
    def v_fk_geoms(q, v):
        k = engine.forward_kinematics(model, q, v)
        gw = engine._geom_world_soa(model, k)
        tau_c, _ = engine.contact_taus(model, k, gw, anc)
        fb = sum(tau_c)
        return q + h * v + 1e-12 * fb, v

    @wrap
    def v_fk_mass(q, v):
        k = engine.forward_kinematics(model, q, v)
        M = engine._mass_matrix_soa(model, k)
        fb = sum(M[i][j] for i in range(model.nl) for j in range(i + 1)
                 if not isinstance(M[i][j], float))
        return q + h * v + 1e-12 * fb, v

    @wrap
    def v_fk_bias(q, v):
        k = engine.forward_kinematics(model, q, v)
        C = engine._bias_forces_soa(model, k, v)
        fb = sum(C)
        return q + h * v + 1e-12 * fb, v

    @wrap
    def v_full(q, v):
        out = engine.step(model, q, v, ctrl1)
        return out.qpos, out.qvel

    t_fk = chain(v_fk)
    t_geo = chain(v_fk_geoms)
    t_mass = chain(v_fk_mass)
    t_bias = chain(v_fk_bias)
    t_full = chain(v_full)

    ms = lambda t: round(1e3 * t / inner, 4)  # per env-step (40 substeps)
    print(json.dumps({
        "num_envs": num_envs, "inner": inner, "substeps": nsub,
        "fk_chain_ms": ms(t_fk),
        "fk_contacts_chain_ms": ms(t_geo),
        "fk_mass_chain_ms": ms(t_mass),
        "fk_bias_chain_ms": ms(t_bias),
        "full_substep_chain_ms": ms(t_full),
    }))


if __name__ == "__main__":
    main()
