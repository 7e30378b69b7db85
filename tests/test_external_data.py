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


# ---------------------------------------------------------------------------
# REAL artifact formats (round-2 item #4a): torch-pickle color tables, mp4
# clips, JPEG trees — synthesized here in the exact on-disk formats the
# reference consumes (env/wrappers.py:117-123, :451-479; augmentations.py:17-62)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def real_format_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dmcgb_real")
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")
    # color_hard.pt: list of setting_kwargs dicts, all-blue self for a
    # recognizable signal
    rows = []
    for i in range(100):
        rows.append({
            "grid_rgb1": np.array([0.1, 0.2, 0.3]),
            "grid_rgb2": np.array([0.2, 0.3, 0.4]),
            "grid_markrgb": np.array([0.0, 0.0, 0.0]),
            "self_rgb": np.array([0.0, 0.0, 1.0]),
            "skybox_rgb": np.array([0.9, 0.1, 0.1]),
            "skybox_rgb2": np.array([0.8, 0.1, 0.1]),
            "skybox_markrgb": np.array([1.0, 1.0, 1.0]),
        })
    torch.save(rows, os.path.join(str(root), "color_hard.pt"))
    # video_easy/video<i>.mp4: solid-red clips (mp4 lossy compression keeps
    # saturated primaries recognizable)
    vd = root / "video_easy"
    vd.mkdir()
    for i in range(2):
        w = cv2.VideoWriter(str(vd / f"video{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 128))
        for _ in range(8):
            img = np.zeros((128, 128, 3), np.uint8)
            img[:, :, 2] = 255  # BGR red
            w.write(img)
        w.release()
    # places365_standard JPEG tree
    jd = root / "places365_standard" / "train" / "abbey"
    jd.mkdir(parents=True)
    for i in range(4):
        img = np.zeros((100, 100, 3), np.uint8)
        img[:, :, 0] = 255  # BGR blue
        cv2.imwrite(str(jd / f"{i:08d}.jpg"), img)
    return str(root)


def test_load_color_table_pt(real_format_root):
    from sgqn_carla_tpu.data.colors import make_color_table

    table = make_color_table("color_hard", external_dir=real_format_root)
    assert table["self_rgb"].shape == (100, 3)
    np.testing.assert_allclose(np.asarray(table["self_rgb"][0]), [0, 0, 1])
    np.testing.assert_allclose(np.asarray(table["skybox_rgb"][5]),
                               [0.9, 0.1, 0.1], atol=1e-6)


def test_color_pt_flows_into_env(real_format_root):
    """The .pt table must actually color the rendered episode: the walker
    body turns blue, the sky red."""
    env = make_env("cartpole", "balance", seed=0, image_size=84,
                   mode="color_hard", external_data_dir=real_format_root)
    state, obs = env.reset(jax.random.PRNGKey(3))
    frame = np.asarray(obs)[-3:].astype(np.int32)  # (3, H, W)
    # sky: the top rows must be red-dominated (skybox_rgb ~ [0.9,0.1,0.1])
    top = frame[:, :10]
    assert (top[0].mean() - top[2].mean()) > 60, top.mean(axis=(1, 2))
    # body: some pixels strongly blue (self_rgb = [0,0,1])
    blue = (frame[2] > 150) & (frame[0] < 90)
    assert blue.sum() > 10


def test_load_mp4_videos(real_format_root):
    vids = get_videos("video_easy", 84, 84, seed=0,
                      external_dir=real_format_root)
    assert vids.shape[0] == 2 and vids.shape[-1] == 3
    assert vids[..., 0].mean() > 200 and vids[..., 1].mean() < 40


def test_mp4_flows_into_env(real_format_root):
    env = make_env("cartpole", "balance", seed=0, image_size=84,
                   mode="video_easy", external_data_dir=real_format_root)
    state, obs = env.reset(jax.random.PRNGKey(0))
    frame = np.asarray(obs)[-3:]
    red = (frame[0] > 180) & (frame[1] < 60) & (frame[2] < 60)
    assert red.mean() > 0.2, f"mp4 background not visible ({red.mean():.3f})"


def test_load_places_jpeg_tree(real_format_root):
    pool = get_overlay_pool(84, 84, seed=0, external_dir=real_format_root)
    assert pool.shape == (4, 3, 84, 84)
    assert pool[:, 2].mean() > 0.8 and pool[:, 0].mean() < 0.15


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
