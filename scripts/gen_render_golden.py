"""Generate golden render frames for regression testing.

SURVEY §4: the reference's rendering tests compare pre-rendered frame
sequences per (scene, camera, resolution) with an RMS tolerance
(reference: src/env/dm_control/dm_control/mujoco/testing/image_utils.py:
162-186 `assert_images_close`, rms tolerance 10). This records the same
kind of fixtures for the raycaster: one deterministic frame per
(domain/task, mode) into ``tests/golden_frames/*.png``.

Run on CPU (tests execute on CPU; cross-backend f32 drift is absorbed by
the RMS tolerance, but same-backend goldens keep it tight):

    JAX_PLATFORMS=cpu python scripts/gen_render_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sgqn_carla_tpu.train.video import _write_png

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden_frames")

# (name, domain, task, mode, size)
CASES = [
    ("walker_walk_train", "walker", "walk", "train", 84),
    ("walker_walk_color_hard", "walker", "walk", "color_hard", 84),
    ("walker_walk_video_easy", "walker", "walk", "video_easy", 84),
    ("cartpole_swingup_train", "cartpole", "swingup", "train", 84),
    ("cheetah_run_train", "cheetah", "run", "train", 84),
    ("walker_walk_train_448", "walker", "walk", "train", 448),
    ("carla_drive_train", None, None, "train", 84),  # CARLA twin
]

SEED = 123


def frame_for(domain, task, mode, size):
    if domain is None:
        from sgqn_carla_tpu.envs.carla_twin import make_carla_env

        env = make_carla_env(mode=mode, seed=SEED)
    else:
        from sgqn_carla_tpu.envs.base import make_env

        env = make_env(domain, task, seed=SEED, mode=mode)
    # the randomized reset pose (seeded, deterministic) is enough scene
    # variety; stepping would compile a per-config step program per case,
    # tripling the test's wall clock for no extra render coverage
    state, obs = env.reset(jax.random.PRNGKey(SEED))
    return np.asarray(env.render_eval(state, size), np.uint8)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, domain, task, mode, size in CASES:
        img = frame_for(domain, task, mode, size)
        _write_png(os.path.join(OUT, f"{name}.png"), img)
        print(f"{name}: {img.shape} mean={img.mean():.1f} std={img.std():.1f}")


if __name__ == "__main__":
    main()
