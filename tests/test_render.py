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


class TestFastRenderer:
    """The production fast path (render/fast.py: grouped capsules + MXU
    dots + deferred shading) must be pixel-equivalent to the reference
    path (round-2: renderer optimization, VERDICT perf item #2)."""

    @pytest.mark.parametrize("domain,task", [("walker", "stand"),
                                             ("cartpole", "balance"),
                                             ("finger", "spin")])
    def test_matches_reference_path(self, domain, task):
        from sgqn_carla_tpu.render.fast import render_scene_fast
        from sgqn_carla_tpu.render.raster import render_scene as ref

        t = load(domain, task)
        state = t.init(jax.random.PRNGKey(3))
        kin = engine.forward_kinematics(t.model, state.qpos, state.qvel)
        app = default_appearance(t.model)
        cam = camera_pose(t.model, t.camera_id, kin)
        Rg, pg = engine.geom_world(t.model, kin)
        a = ref(t.model, Rg, pg, app, cam, 84, 84)
        b = render_scene_fast(t.model, Rg, pg, app, cam, 84, 84)
        # grazing rays can flip on float association (h = b²−ac near 0):
        # allow a handful of boundary pixels, exactness everywhere else
        seg_mm = np.asarray(a[2]) != np.asarray(b[2])
        assert seg_mm.sum() <= 5
        dr = np.abs(np.asarray(a[0], np.int32) - np.asarray(b[0], np.int32))
        assert dr[~seg_mm].max() <= 2

    def test_background_compositing_matches(self):
        from sgqn_carla_tpu.render.fast import render_scene_fast
        from sgqn_carla_tpu.render.raster import render_scene as ref

        t = load("walker", "stand")
        state = t.init(jax.random.PRNGKey(0))
        kin = engine.forward_kinematics(t.model, state.qpos, state.qvel)
        app = default_appearance(t.model)
        cam = camera_pose(t.model, t.camera_id, kin)
        Rg, pg = engine.geom_world(t.model, kin)
        bg = jnp.tile(jnp.linspace(0, 1, 84)[None, :, None], (84, 1, 3))
        a = ref(t.model, Rg, pg, app, cam, 84, 84, background=bg,
                bg_mask_materials=("grid",))
        b = render_scene_fast(t.model, Rg, pg, app, cam, 84, 84,
                              background=bg, bg_mask_materials=("grid",))
        dr = np.abs(np.asarray(a[0], np.int32) - np.asarray(b[0], np.int32))
        assert dr.max() <= 2


def test_pallas_kernel_matches_reference_interpret():
    """The Pallas tile rasterizer (render/pallas_raster.py) traces the same
    image as the jnp path — validated in interpreter mode on CPU (on real
    TPU the match is bit-exact; verified on-chip during development)."""
    from sgqn_carla_tpu.render import pallas_raster as pr
    from sgqn_carla_tpu.render.raster import render_scene as ref
    from jax.experimental.pallas import tpu as pltpu

    t = load("cartpole", "balance")
    state = t.init(jax.random.PRNGKey(1))
    kin = engine.forward_kinematics(t.model, state.qpos, state.qvel)
    app = default_appearance(t.model)
    cam = camera_pose(t.model, t.camera_id, kin)
    Rg, pg = engine.geom_world(t.model, kin)
    a = ref(t.model, Rg, pg, app, cam, 84, 84)

    appb = jax.tree_util.tree_map(lambda x: x[None], app)
    with pltpu.force_tpu_interpret_mode():
        rgb, seg = pr.render_batch(
            t.model, Rg[None], pg[None], appb, cam.pos[None], cam.R[None],
            cam.fovy, 84, 84)
    rgb8 = np.asarray(jnp.clip(rgb[0] * 255, 0, 255).astype(jnp.uint8))
    rgb8 = np.transpose(rgb8, (1, 2, 0))
    assert (np.asarray(seg[0]) == np.asarray(a[2])).all()
    dr = np.abs(rgb8.astype(np.int32) - np.asarray(a[0], np.int32))
    # texture-edge pixels can flip on float association; bound their count
    assert (dr.max(axis=2) > 2).sum() <= 10
    assert dr.max() <= 32


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
