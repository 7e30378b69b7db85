"""Op-count profile of one physics substep (walker) from the jaxpr.

Every traced equation on an (E,)-shaped operand is ~one VPU vreg issue per
1024 lanes at f32; the histogram below attributes equation counts to the
source function that emitted them. This is the physics analogue of the
renderer's 550-op/pixel accounting (docs/PERF.md) — it tells us which
phase of the substep (FK / CRBA / bias / contacts / limits / solve) is
actually issuing the ops, independent of XLA fusion, so optimization
effort lands where the ops are.

Run on CPU: python scripts/count_physics_ops.py [domain] [task]
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.domains import load as load_domain


def main():
    domain = sys.argv[1] if len(sys.argv) > 1 else "walker"
    task = sys.argv[2] if len(sys.argv) > 2 else "walk"
    t = load_domain(domain, task)
    model = t.model
    qpos = jnp.zeros((model.nl,), jnp.float32)
    qvel = jnp.zeros((model.nl,), jnp.float32)
    ctrl = jnp.zeros((model.nu,), jnp.float32)

    jaxpr = jax.make_jaxpr(lambda q, qd, u: engine.step(model, q, qd, u))(
        qpos, qvel, ctrl)

    by_fn = collections.Counter()
    by_prim = collections.Counter()
    total = 0

    def walk(jx):
        nonlocal total
        for eqn in jx.eqns:
            for sub in jax.core.jaxprs_in_params(eqn.params):
                walk(sub)
            if eqn.primitive.name in ("pjit", "closed_call", "custom_jvp_call",
                                      "custom_vjp_call", "scan", "while",
                                      "cond"):
                continue
            total += 1
            by_prim[eqn.primitive.name] += 1
            frame = None
            src = eqn.source_info
            try:
                for fr in src.traceback.frames:
                    fn = fr.file_name
                    if "sgqn_carla_tpu" in fn:
                        frame = f"{os.path.basename(fn)}:{fr.function_name}"
                        break
            except Exception:
                pass
            by_fn[frame or "?"] += 1

    walk(jaxpr.jaxpr)
    print(f"{domain}-{task}: nl={model.nl} ngeom={len(model.geoms)} "
          f"pairs={len(model.contact_pairs)} total_eqns={total}")
    print("\n-- by source function --")
    for k, v in by_fn.most_common(25):
        print(f"{v:7d}  {k}")
    print("\n-- by primitive --")
    for k, v in by_prim.most_common(20):
        print(f"{v:7d}  {k}")


if __name__ == "__main__":
    main()
