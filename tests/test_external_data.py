"""External real-dataset ingestion (VERDICT #7; reference role:
setup/config.cfg + utils.load_config, src/utils.py:60-66, and the DMCGB
video/Places pipelines at env/wrappers.py:43-52, augmentations.py:17-76).

Proves bytes on disk actually flow into (a) video-mode rendered backgrounds
and (b) the agents' overlay pool, and that `setup/config.cfg` resolution
("auto") finds them.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.core.config import Config, load_data_config, resolve_data_dir
from sgqn_carla_tpu.data.overlay import get_overlay_pool
from sgqn_carla_tpu.data.videos import get_videos
from sgqn_carla_tpu.envs import make_env


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Synthetic dataset: solid-magenta video clips + solid-cyan overlays —
    colors the procedural pools never produce at full saturation."""
    root = tmp_path_factory.mktemp("datasets")
    for mode in ("video_easy", "video_hard"):
        d = root / mode
        d.mkdir()
        clip = np.zeros((6, 84, 84, 3), np.uint8)
        clip[..., 0] = 255
        clip[..., 2] = 255  # magenta
        for i in range(3):
            np.save(d / f"clip{i}.npy", clip)
    ov = root / "overlay"
    ov.mkdir()
    img = np.zeros((3, 84, 84), np.float32)
    img[1] = 1.0
    img[2] = 1.0  # cyan, CHW [0,1]
    for i in range(4):
        np.save(ov / f"img{i}.npy", img)
    return str(root)


def test_get_videos_prefers_external(data_root):
    vids = get_videos("video_easy", 84, 84, seed=0, external_dir=data_root)
    assert vids.shape[0] == 3 and vids.shape[-1] == 3
    assert (vids[..., 0] == 255).all() and (vids[..., 1] == 0).all()


def test_overlay_pool_prefers_external(data_root):
    pool = get_overlay_pool(84, 84, seed=0,
                            external_dir=os.path.join(data_root, "overlay"))
    assert pool.shape[0] == 4
    np.testing.assert_allclose(pool[:, 0], 0.0)
    np.testing.assert_allclose(pool[:, 1], 1.0)


def test_video_mode_background_uses_external_clips(data_root):
    """The rendered video_easy background must show the magenta clip where
    the procedural sky/floor would otherwise be."""
    env = make_env("cartpole", "balance", seed=0, image_size=84,
                   mode="video_easy", external_data_dir=data_root)
    state, obs = env.reset(jax.random.PRNGKey(0))
    frame = np.asarray(obs)[-3:]  # newest frame, (3, 84, 84)
    magenta = (frame[0] > 200) & (frame[2] > 200) & (frame[1] < 60)
    assert magenta.mean() > 0.2, (
        f"external background not visible (magenta fraction "
        f"{magenta.mean():.3f})")


def test_video_mode_procedural_without_external():
    env = make_env("cartpole", "balance", seed=0, image_size=84,
                   mode="video_easy")
    state, obs = env.reset(jax.random.PRNGKey(0))
    frame = np.asarray(obs)[-3:]
    magenta = (frame[0] > 200) & (frame[2] > 200) & (frame[1] < 60)
    assert magenta.mean() < 0.05


def test_config_cfg_auto_resolution(data_root, tmp_path, monkeypatch):
    """"auto" walks setup/config.cfg's datasets list like the reference's
    utils.load_config."""
    setup = tmp_path / "setup"
    setup.mkdir()
    (setup / "config.cfg").write_text(json.dumps(
        {"datasets": ["/nonexistent/place", data_root]}))
    monkeypatch.chdir(tmp_path)
    assert load_data_config("datasets")[1] == data_root
    cfg = Config(external_data_dir="auto")
    assert resolve_data_dir(cfg) == data_root
    # explicit paths pass through verbatim; unset stays procedural
    assert resolve_data_dir(Config(external_data_dir="/x")) == "/x"
    assert resolve_data_dir(Config()) == ""
