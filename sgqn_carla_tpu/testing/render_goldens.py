"""Single source of truth for the golden-frame cases: the generator
(scripts/gen_render_golden.py) and the regression test
(tests/test_render_golden.py) must build byte-identical frame configs, so
the case list, seed, and frame construction live here once.

Reference analogue: dm_control's `mujoco/testing/image_utils.py` sequence
catalog consumed by both its golden tooling and render_test.py.
"""

from __future__ import annotations

import jax
import numpy as np

# (name, domain, task, mode, size); domain=None → the CARLA twin
CASES = [
    ("walker_walk_train", "walker", "walk", "train", 84),
    ("walker_walk_color_hard", "walker", "walk", "color_hard", 84),
    ("walker_walk_video_easy", "walker", "walk", "video_easy", 84),
    ("cartpole_swingup_train", "cartpole", "swingup", "train", 84),
    ("cheetah_run_train", "cheetah", "run", "train", 84),
    ("walker_walk_train_448", "walker", "walk", "train", 448),
    ("carla_drive_train", None, None, "train", 84),
    # round-3 engine extensions: planar/free-root/ball-joint/implicit-
    # contact domains get the same regression net
    ("pendulum_swingup_train", "pendulum", "swingup", "train", 84),
    ("reacher_easy_train", "reacher", "easy", "train", 84),
    ("fish_upright_train", "fish", "upright", "train", 84),
    ("quadruped_walk_train", "quadruped", "walk", "train", 84),
    ("humanoid_stand_train", "humanoid", "stand", "train", 84),
    ("manipulator_bring_ball_train", "manipulator", "bring_ball", "train", 84),
]

SEED = 123


def golden_frame(domain, task, mode, size) -> np.ndarray:
    """Deterministic (H, W, 3) uint8 frame for one case — reset pose only
    (stepping would compile a per-config step program per case, tripling
    the test's wall clock for no extra render coverage)."""
    if domain is None:
        from sgqn_carla_tpu.envs.carla_twin import make_carla_env

        env = make_carla_env(mode=mode, seed=SEED)
    else:
        from sgqn_carla_tpu.envs.base import make_env

        env = make_env(domain, task, seed=SEED, mode=mode)
    state, _ = env.reset(jax.random.PRNGKey(SEED))
    return np.asarray(env.render_eval(state, size), np.uint8)
