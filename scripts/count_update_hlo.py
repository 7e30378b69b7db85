"""HLO op inventory of the jitted agent update (learner-optimization aid).

Compiles `agent._update` for CPU (backend-agnostic proxy: CSE/DCE run in
both pipelines) and counts convolutions / sorts / top-k / dots in the
optimized HLO. Used to verify that restructurings actually remove trunk
traversals instead of trusting XLA to CSE them (docs/PERF.md learner
section).

Usage: python scripts/count_update_hlo.py [algo] [batch]
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    from sgqn_carla_tpu.agents import make_agent
    from sgqn_carla_tpu.core.config import Config
    from sgqn_carla_tpu.data.replay import ReplayBuffer

    algo = sys.argv[1] if len(sys.argv) > 1 else "sgsac"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    buffer = ReplayBuffer(num_envs=2, episode_len=25, capacity=200,
                          image_size=84, action_size=6, batch_size=batch)
    rstate = buffer.init()
    cfg = Config(domain_name="walker", task_name="walk", algorithm=algo,
                 batch_size=batch).finalize()
    agent = make_agent((9, 84, 84), (6,), cfg)
    astate = agent.init_state(jax.random.PRNGKey(0))

    def fn(astate, rstate):
        return agent._update(astate, rstate, buffer)

    lowered = jax.jit(fn).lower(astate, rstate)
    hlo = lowered.compile().as_text()

    ops = Counter()
    for line in hlo.splitlines():
        m = re.search(r"=\s+\S+\s+(convolution|sort|topk|top-k|dot|"
                      r"custom-call)\(", line)
        if m:
            ops[m.group(1)] += 1
        if "custom-call" in line:
            cm = re.search(r'custom_call_target="([^"]+)"', line)
            if cm:
                ops[f"cc:{cm.group(1)}"] += 1
    total_lines = hlo.count("\n")
    print(f"algo={algo} batch={batch} hlo_lines={total_lines}")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1]):
        print(f"  {k:40s} {v}")


if __name__ == "__main__":
    main()
