"""Optimized-HLO op histogram for one vmapped physics substep.

`count_physics_ops.py` counts jaxpr equations — pre-XLA, so it misses
CSE/DCE/constant folding. This counts instructions in the *optimized* HLO
(CPU backend; CSE/DCE are platform-independent passes), which is the
honest proxy for VPU issue count on the TPU. Use both: jaxpr attribution
says *where* ops come from, this says how many survive.

Run: python scripts/count_hlo_ops.py [domain] [task] [batch]
"""

import collections
import os
import re
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
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    t = load_domain(domain, task)
    model = t.model
    qpos = jnp.zeros((B, model.nl), jnp.float32)
    qvel = jnp.zeros((B, model.nl), jnp.float32)
    ctrl = jnp.zeros((B, model.nu), jnp.float32)

    step = jax.vmap(lambda q, qd, u: engine.step(model, q, qd, u)[:2])
    compiled = jax.jit(step).lower(qpos, qvel, ctrl).compile()
    hlo = compiled.as_text()

    counts = collections.Counter()
    # one instruction per line: "  %name = f32[8]{0} opcode(...)"
    for m in re.finditer(r"= \S+ ([a-z0-9-]+)\(", hlo):
        counts[m.group(1)] += 1
    total = sum(v for k, v in counts.items()
                if k not in ("parameter", "constant", "tuple",
                             "get-tuple-element", "bitcast", "copy"))
    print(f"{domain}-{task} B={B}: optimized-HLO compute instructions ≈ {total}")
    for k, v in counts.most_common(25):
        print(f"{v:7d}  {k}")


if __name__ == "__main__":
    main()
