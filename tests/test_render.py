"""Renderer tests: geometry hits, segmentation, compositing, vmap, cameras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.domains import load
from sgqn_carla_tpu.render import (
    Camera, default_appearance, render, render_scene,
)
from sgqn_carla_tpu.render.cameras import camera_pose


def _walker_frame(size=84):
    t = load("walker", "stand")
    state = t.init(jax.random.PRNGKey(0))
    state = state.replace(qpos=jnp.zeros(t.model.nv), qvel=jnp.zeros(t.model.nv))
    kin = engine.forward_kinematics(t.model, state.qpos, state.qvel)
    app = default_appearance(t.model)
    cam = camera_pose(t.model, 0, kin)
    return t, kin, app, cam, render(t.model, kin, app, cam, size, size)


class TestRender:
    def test_walker_scene_structure(self):
        t, kin, app, cam, (rgb, depth, seg) = _walker_frame()
        rgb = np.asarray(rgb)
        seg = np.asarray(seg)
        assert rgb.shape == (84, 84, 3) and rgb.dtype == np.uint8
        assert seg.shape == (84, 84)
        # scene must contain sky, floor, and body pixels
        ids = set(np.unique(seg).tolist())
        assert -1 in ids, "no sky pixels"
        assert 0 in ids, "no floor pixels (geom 0 is the floor plane)"
        body_geoms = [i for i, g in enumerate(t.model.geoms) if g.material == "self"]
        assert any(b in ids for b in body_geoms), "walker body not visible"
        # walker body should be roughly centered horizontally (trackcom)
        body_mask = np.isin(seg, body_geoms)
        cols = np.where(body_mask.any(axis=0))[0]
        assert 10 < cols.mean() < 74

    def test_sky_above_floor_below(self):
        _, _, _, _, (rgb, depth, seg) = _walker_frame()
        seg = np.asarray(seg)
        # top rows mostly sky, bottom rows mostly floor
        assert (seg[0] == -1).mean() > 0.8
        assert (seg[-1] == 0).mean() > 0.8

    def test_depth_finite_on_hits(self):
        _, _, _, _, (rgb, depth, seg) = _walker_frame()
        depth = np.asarray(depth)
        seg = np.asarray(seg)
        assert np.isfinite(depth[seg >= 0]).all()
        assert (depth[seg >= 0] > 0.1).all()

    def test_background_compositing_video_easy(self):
        """Sky replaced by background; floor and body kept (video_easy)."""
        t, kin, app, cam, (rgb0, _, seg) = _walker_frame()
        bg = jnp.ones((84, 84, 3), jnp.float32) * jnp.asarray([1.0, 0.0, 0.0])
        rgb1, _, _ = render(t.model, kin, app, cam, 84, 84, background=bg)
        rgb0, rgb1, seg = np.asarray(rgb0), np.asarray(rgb1), np.asarray(seg)
        sky = seg == -1
        assert (rgb1[sky] == [255, 0, 0]).all()
        np.testing.assert_array_equal(rgb1[~sky], rgb0[~sky])

    def test_background_compositing_video_hard(self):
        """Sky AND floor replaced (video_hard: grid also chroma-keyed,
        reference: env/wrappers.py:96-101)."""
        t, kin, app, cam, (rgb0, _, seg) = _walker_frame()
        bg = jnp.ones((84, 84, 3), jnp.float32) * jnp.asarray([1.0, 0.0, 0.0])
        rgb1, _, _ = render(t.model, kin, app, cam, 84, 84, background=bg,
                            bg_mask_materials=("grid",))
        rgb1, seg = np.asarray(rgb1), np.asarray(seg)
        replaced = (seg == -1) | (seg == 0)
        assert (rgb1[replaced] == [255, 0, 0]).all()

    def test_color_change_changes_pixels(self):
        t, kin, app, cam, (rgb0, _, seg) = _walker_frame()
        app2 = app.replace(geom_rgba=app.geom_rgba.at[:, :3].set(
            jnp.asarray([0.9, 0.1, 0.1])))
        rgb2, _, _ = render(t.model, kin, app2, cam, 84, 84)
        body = np.asarray(seg) > 0
        assert (np.asarray(rgb2)[body] != np.asarray(rgb0)[body]).any()

    def test_cartpole_fixed_camera(self):
        t = load("cartpole", "balance")
        state = t.init(jax.random.PRNGKey(0))
        state = state.replace(qpos=jnp.zeros(2), qvel=jnp.zeros(2))
        kin = engine.forward_kinematics(t.model, state.qpos, state.qvel)
        app = default_appearance(t.model)
        cam = camera_pose(t.model, 0, kin)
        rgb, depth, seg = render(t.model, kin, app, cam, 84, 84)
        ids = set(np.unique(np.asarray(seg)).tolist())
        cart_geom = next(i for i, g in enumerate(t.model.geoms) if g.name == "cart")
        pole_geom = next(i for i, g in enumerate(t.model.geoms) if g.name == "pole_1")
        assert cart_geom in ids and pole_geom in ids

    def test_jit_vmap_batch_render(self):
        t = load("cartpole", "balance")
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        states = jax.vmap(t.init)(keys)
        app = default_appearance(t.model)

        def one(qpos, qvel):
            kin = engine.forward_kinematics(t.model, qpos, qvel)
            cam = camera_pose(t.model, 0, kin)
            rgb, _, _ = render(t.model, kin, app, cam, 84, 84)
            return rgb

        rgbs = jax.jit(jax.vmap(one))(states.qpos, states.qvel)
        assert rgbs.shape == (4, 84, 84, 3) and rgbs.dtype == jnp.uint8
        # different init poses → different frames
        assert (np.asarray(rgbs[0]) != np.asarray(rgbs[1])).any()

    def test_render_448_eval_size(self):
        t, kin, app, cam, _ = _walker_frame()
        rgb, _, _ = render(t.model, kin, app, cam, 448, 448)
        assert rgb.shape == (448, 448, 3)


def test_dump_debug_pngs(tmp_path):
    """Write sample frames for human inspection (kept out of git)."""
    import struct, zlib

    def write_png(path, arr):
        h, w, _ = arr.shape
        raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
        def chunk(tag, data):
            c = struct.pack(">I", len(data)) + tag + data
            return c + struct.pack(">I", zlib.crc32(tag + data))
        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        with open(path, "wb") as f:
            f.write(png)

    _, _, _, _, (rgb, _, _) = _walker_frame(size=168)
    write_png(str(tmp_path / "walker.png"), np.asarray(rgb))
    assert (tmp_path / "walker.png").exists()
