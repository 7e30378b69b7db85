"""Per-phase microbenchmark of the physics substep chain (walker, E envs).

Round-2 VERDICT item #1: physics is ~43% of the env step but had one
optimization pass to the renderer's six. This times each stage of
`engine._forward_dynamics` in isolation (same vmap batch, same lax.scan
fusion, perturbed inputs so nothing hoists) so op-shaving lands on the
dominant term, the way `render/fast.py`'s capsule pass was tuned.

Usage:  python scripts/profile_physics.py [num_envs] [inner] [domain] [task]
Prints one JSON object of ms per (batch × inner)-substep block per phase.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgqn_carla_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import numpy as np


def timeit(fn, *args, reps=5):
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

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    domain = sys.argv[3] if len(sys.argv) > 3 else "walker"
    task_name = sys.argv[4] if len(sys.argv) > 4 else "walk"

    env = make_env(domain, task_name, image_size=84, episode_length=1000,
                   action_repeat=4, mode="train")
    venv = VectorEnv(env, E)
    states, _ = venv.reset(jax.random.PRNGKey(0))
    model = env.task.model
    anc = engine._ancestors(model)
    qpos = states.phys.qpos
    qvel = states.phys.qvel
    ctrl = jnp.zeros((E, env.action_size), jnp.float32)

    # Each phase runs inside the same scan skeleton: perturb qpos/qvel per
    # iteration (so nothing hoists), reduce the phase output to a scalar
    # (so nothing dead-codes), carry the perturbed state.
    def scan_over(phase):
        @jax.jit
        def run(qp, qv):
            def body(c, i):
                qp, qv = c
                qp = qp + 1e-7 * (i + 1)
                qv = qv + 1e-7
                s = jax.vmap(lambda a, b: phase(a, b))(qp, qv)
                return (qp, qv), s
            (_, _), ss = jax.lax.scan(body, (qp, qv), jnp.arange(inner))
            return ss.sum()
        return run

    def red(x):
        if isinstance(x, (list, tuple)):
            return sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(x))
        return jnp.sum(x)

    phases = {}

    def fk(qp, qv):
        return red(engine.forward_kinematics(model, qp, qv))
    phases["fk"] = fk

    def fk_mass(qp, qv):
        kin = engine.forward_kinematics(model, qp, qv)
        return red(engine._mass_matrix_soa(model, kin))
    phases["fk+mass"] = fk_mass

    def fk_bias(qp, qv):
        kin = engine.forward_kinematics(model, qp, qv)
        return red(engine._bias_forces_soa(model, kin, qv))
    phases["fk+bias"] = fk_bias

    def taus(qp, qv):
        return red(engine.applied_taus(model, qp, qv, ctrl[0]))
    phases["applied_taus"] = taus

    if len(model.contact_pairs) and not model.implicit_contacts:
        def fk_contacts(qp, qv):
            kin = engine.forward_kinematics(model, qp, qv)
            gw = engine._geom_world_soa(model, kin)
            tau_c, pair_f = engine.contact_taus(model, kin, gw, anc)
            return red(tau_c) + red(pair_f)
        phases["fk+geoms+contacts"] = fk_contacts

        def fk_geoms(qp, qv):
            kin = engine.forward_kinematics(model, qp, qv)
            return red(list(engine._geom_world_soa(model, kin)))
        phases["fk+geoms"] = fk_geoms

    def fk_mass_solve(qp, qv):
        kin = engine.forward_kinematics(model, qp, qv)
        M = engine._mass_matrix_soa(model, kin)
        rhs = [qv[i] for i in range(model.nl)]
        return red(engine._solve_spd(M, rhs, model.nl))
    phases["fk+mass+solve"] = fk_mass_solve

    def substep(qp, qv):
        out = engine.step(model, qp, qv, ctrl[0])
        return red(out.qpos) + red(out.qvel) + red(out.contact_force)
    phases["full_substep"] = substep

    results = {"num_envs": E, "inner": inner, "nl": model.nl,
               "domain": f"{domain}_{task_name}",
               "contact_pairs": len(model.contact_pairs)}
    for name, phase in phases.items():
        t = timeit(scan_over(phase), qpos, qvel)
        results[name + "_ms"] = round(1e3 * t / inner, 4)
    # derived marginals
    if "fk+geoms+contacts_ms" in results:
        results["contacts_alone_ms"] = round(
            results["fk+geoms+contacts_ms"] - results["fk+geoms_ms"], 4)
        results["geoms_alone_ms"] = round(
            results["fk+geoms_ms"] - results["fk_ms"], 4)
    results["mass_alone_ms"] = round(
        results["fk+mass_ms"] - results["fk_ms"], 4)
    results["bias_alone_ms"] = round(
        results["fk+bias_ms"] - results["fk_ms"], 4)
    results["solve_alone_ms"] = round(
        results["fk+mass+solve_ms"] - results["fk+mass_ms"], 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
