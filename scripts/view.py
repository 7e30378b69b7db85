"""Offline task viewer — the stand-in for dm_control's interactive GLFW
viewer (reference: src/env/dm_control/dm_control/viewer/, 5.7 kLoC; SURVEY
§2.2 marks it off the hot path).

Rolls any registered (domain, task) under a chosen policy and writes a
448×448 mp4 (PNG sequence fallback) through the same render path eval
videos use, including the distraction mode.

    python scripts/view.py walker walk                      # random policy
    python scripts/view.py cheetah run --mode video_easy --steps 200
    python scripts/view.py quadruped escape --policy zero --out /tmp/view
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sgqn_carla_tpu.core.cache import enable_persistent_cache
from sgqn_carla_tpu.envs.base import make_env
from sgqn_carla_tpu.train.video import VideoRecorder


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("domain")
    p.add_argument("task")
    p.add_argument("--mode", default="train",
                   help="train | color_easy | color_hard | video_easy | "
                        "video_hard | distracting_cs")
    p.add_argument("--steps", type=int, default=125,
                   help="wrapper steps to roll (x action_repeat env steps)")
    p.add_argument("--policy", default="random", choices=["random", "zero"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--intensity", type=float, default=0.0,
                   help="distracting_cs intensity")
    p.add_argument("--out", default="viewer_out")
    args = p.parse_args()

    enable_persistent_cache()
    env = make_env(args.domain, args.task, seed=args.seed, mode=args.mode,
                   intensity=args.intensity)
    video = VideoRecorder(args.out, height=args.size, width=args.size)
    video.init(enabled=True)

    rng = jax.random.PRNGKey(args.seed)
    rng, k = jax.random.split(rng)
    state, obs = env.reset(k)
    video.record(env, state)
    a_dim = env.action_size
    for t in range(args.steps):
        if args.policy == "random":
            rng, k = jax.random.split(rng)
            action = jax.random.uniform(k, (a_dim,), minval=-1.0, maxval=1.0)
        else:
            action = np.zeros(a_dim, np.float32)
        state, res = env.step(state, action)
        video.record(env, state)
        if (t + 1) % 25 == 0:
            print(f"  step {t + 1}/{args.steps}  reward={float(res.reward):.3f}")

    name = f"{args.domain}_{args.task}_{args.mode}.mp4"
    video.save(name)
    print(f"wrote {os.path.join(args.out, name)} "
          f"({len(video.frames)} frames @ {args.size}px)")


if __name__ == "__main__":
    main()
