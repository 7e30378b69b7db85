"""Auxiliary-subsystem tests: distracting_cs, checkpoint/resume, fused
trainer, SGQN visualization, native hostio."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.core import checkpoint as ckpt
from sgqn_carla_tpu.envs import make_env


class TestDistractingCS:
    @pytest.fixture(scope="class")
    def env(self):
        return make_env("walker", "walk", mode="distracting_cs",
                        intensity=0.1, image_size=48, episode_length=16)

    def test_reset_and_step(self, env):
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (9, 48, 48)
        step = jax.jit(env.step)
        s1, r1 = step(state, jnp.zeros(6))
        s2, r2 = step(s1, jnp.zeros(6))
        assert np.isfinite(float(r1.reward))
        # camera walk state must evolve
        assert float(s2.distract.cam.h) != float(state.distract.cam.h) or \
               float(s2.distract.cam.radius) != float(state.distract.cam.radius)

    def test_intensity_scales_camera_range(self):
        from sgqn_carla_tpu.envs.distracting import make_cam_config
        e = make_env("walker", "walk", mode="distracting_cs", intensity=0.1,
                     image_size=32, episode_length=8)
        weak = make_cam_config(e.task.model, 0, 0.05, "walker")
        strong = make_cam_config(e.task.model, 0, 0.5, "walker")
        assert (strong.max_h - strong.min_h) > (weak.max_h - weak.min_h)
        assert strong.max_vel > weak.max_vel

    def test_color_walk_bounded(self, env):
        state, _ = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(6):
            state, _ = step(state, jnp.zeros(6))
        lo = np.asarray(env.color_lo.grid_rgb1)
        hi = np.asarray(env.color_hi.grid_rgb1)
        cur = np.asarray(state.appearance.grid_rgb1)
        assert (cur >= lo - 1e-6).all() and (cur <= hi + 1e-6).all()

    def test_num_videos_difficulty_map(self):
        from sgqn_carla_tpu.envs.distracting import num_videos_for
        assert num_videos_for(0.025, 100) == 2
        assert num_videos_for(0.2, 100) == 8
        assert num_videos_for(0.5, 100) == 100  # None → all

    def test_pingpong(self):
        from sgqn_carla_tpu.envs.distracting import pingpong_index
        idx = [int(pingpong_index(t, 4)) for t in range(8)]
        assert idx == [0, 1, 2, 3, 2, 1, 0, 1]


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
        ckpt.save(str(tmp_path), tree, 100)
        like = jax.tree_util.tree_map(jnp.zeros_like, tree)
        restored = ckpt.restore(str(tmp_path), 100, like)
        np.testing.assert_allclose(np.asarray(restored["a"]),
                                   np.asarray(tree["a"]))
        np.testing.assert_allclose(np.asarray(restored["b"]["c"]),
                                   np.asarray(tree["b"]["c"]))
        assert ckpt.latest_step(str(tmp_path)) == 100

    def test_missing_returns_none(self, tmp_path):
        assert ckpt.restore(str(tmp_path), 5, {"x": jnp.zeros(1)}) is None


class TestNative:
    def test_png_and_resize(self, tmp_path):
        from sgqn_carla_tpu.core import native
        if not native.available():
            pytest.skip("no native toolchain")
        frames = np.random.randint(0, 255, (2, 32, 32, 3), np.uint8)
        paths = [str(tmp_path / f"{i}.png") for i in range(2)]
        assert native.png_write_batch(frames, paths)
        for p in paths:
            data = open(p, "rb").read()
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = native.resize_bilinear(frames[0], 16, 16)
        assert out.shape == (16, 16, 3)

    def test_synth_pool(self):
        from sgqn_carla_tpu.core import native
        if not native.available():
            pytest.skip("no native toolchain")
        p = native.synth_pool(4, 32, 32, seed=1)
        assert p.shape == (4, 32, 32, 3) and p.std() > 10


class TestSGQNVisualize:
    def test_image_dump(self, tmp_path):
        from sgqn_carla_tpu.agents import make_agent
        from sgqn_carla_tpu.agents.visualize import save_attribution_images
        from sgqn_carla_tpu.core.config import Config
        from sgqn_carla_tpu.data.overlay import get_overlay_pool

        cfg = Config(algorithm="sgsac", num_shared_layers=11, num_filters=8,
                     hidden_dim=32, projection_dim=16, batch_size=4).finalize()
        pool = jnp.asarray(get_overlay_pool(84, 84, num=4))
        agent = make_agent((9, 84, 84), (2,), cfg, overlay_pool=pool)
        astate = agent.init_state(jax.random.PRNGKey(0))
        obs = np.random.randint(0, 255, (4, 9, 84, 84)).astype(np.float32)
        act = np.zeros((4, 2), np.float32)
        names = save_attribution_images(agent, astate, obs, act,
                                        str(tmp_path), 0)
        assert "observation" in names and "attrib_q0.95" in names
        out = os.listdir(tmp_path / "original")
        assert len(out) == len(names)
