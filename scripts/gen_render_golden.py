"""Generate golden render frames for regression testing.

SURVEY §4: the reference's rendering tests compare pre-rendered frame
sequences per (scene, camera, resolution) with an RMS tolerance
(reference: src/env/dm_control/dm_control/mujoco/testing/image_utils.py:
162-186 `assert_images_close`, rms tolerance 10). This records the same
kind of fixtures for the raycaster into ``tests/golden_frames/*.png``;
the case list/seed/frame construction are shared with the test via
`sgqn_carla_tpu.testing.render_goldens`.

Run on CPU (tests execute on CPU; same-backend goldens keep the RMS
tolerance tight):

    python scripts/gen_render_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from sgqn_carla_tpu.core.cache import enable_persistent_cache

enable_persistent_cache(".jax_cache_cpu")

from sgqn_carla_tpu.testing.render_goldens import CASES, golden_frame
from sgqn_carla_tpu.train.video import _write_png

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden_frames")


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, domain, task, mode, size in CASES:
        img = golden_frame(domain, task, mode, size)
        _write_png(os.path.join(OUT, f"{name}.png"), img)
        print(f"{name}: {img.shape} mean={img.mean():.1f} std={img.std():.1f}")


if __name__ == "__main__":
    main()
