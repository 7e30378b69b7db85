"""Heightfield terrain tests (quadruped escape parity).

Reference: suite/quadruped.py:362-423 (Escape.initialize_episode terrain
generation, rangefinder scaling) and quadruped.xml:13 hfield spec.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.physics import hfield as hf


class TestTerrainGeneration:
    def test_shape_and_range(self):
        t = hf.generate_terrain(jax.random.PRNGKey(0))
        assert t.shape == (hf.RES, hf.RES)
        t = np.asarray(t)
        assert t.min() >= 0.0
        assert t.max() <= hf.TERRAIN_ZMAX
        # bumps keep the rim well above half the bowl amplitude somewhere
        assert t.max() > 0.15 * hf.TERRAIN_ZMAX

    def test_bowl_profile(self):
        """Low at the center, rim at half radius, back to ~0 at the edge
        (quadruped.py:375-378 sinusoidal bowl)."""
        t = np.asarray(hf.generate_terrain(jax.random.PRNGKey(1)))
        c = hf.RES // 2
        center = t[c, c]
        rim = t[c, c + hf.RES // 4]          # r = 0.5 → bowl = 1
        edge = t[c, hf.RES - 1]              # r = 1 → bowl = 0
        assert center < 0.1
        assert rim > 0.5
        assert edge < 1e-3

    def test_seeds_differ(self):
        a = np.asarray(hf.generate_terrain(jax.random.PRNGKey(2)))
        b = np.asarray(hf.generate_terrain(jax.random.PRNGKey(3)))
        assert np.abs(a - b).max() > 0.01


class TestSampling:
    def _ramp(self):
        # synthetic planar ramp h(x, y) = 0.1·x + 1.0 over the full grid
        xs = np.linspace(-hf.TERRAIN_HALF, hf.TERRAIN_HALF, hf.RES)
        return jnp.asarray(np.broadcast_to(0.1 * xs + 1.0,
                                           (hf.RES, hf.RES)), jnp.float32)

    def test_bilinear_height(self):
        terrain = self._ramp()
        x = jnp.asarray([0.0, 5.0, -12.3])
        y = jnp.asarray([0.0, -7.0, 3.3])
        h, n = hf.sample(terrain, x, y)
        np.testing.assert_allclose(np.asarray(h),
                                   0.1 * np.asarray(x) + 1.0 + hf.TERRAIN_Z0,
                                   atol=1e-3)
        # normal of the ramp: normalize((-0.1, 0, 1))
        nexp = np.array([-0.1, 0.0, 1.0]) / np.sqrt(1.01)
        for i in range(3):
            np.testing.assert_allclose(np.asarray(n[i]), nexp[i], atol=1e-3)

    def test_outside_grid_extends_flat(self):
        terrain = self._ramp()
        h_edge, n = hf.sample(terrain, jnp.float32(100.0), jnp.float32(0.0))
        h_at_edge, _ = hf.sample(terrain, jnp.float32(hf.TERRAIN_HALF),
                                 jnp.float32(0.0))
        assert abs(float(h_edge) - float(h_at_edge)) < 0.05

    def test_raycast_vertical(self):
        terrain = self._ramp()
        o = (jnp.asarray([2.0]), jnp.asarray([0.0]), jnp.asarray([10.0]))
        d = (jnp.zeros(1), jnp.zeros(1), -jnp.ones(1))
        t, n, hit = hf.raycast(terrain, o, d, tmax=20.0)
        assert bool(hit[0])
        h_surf = 0.1 * 2.0 + 1.0 + hf.TERRAIN_Z0
        np.testing.assert_allclose(float(t[0]), 10.0 - h_surf, atol=0.02)

    def test_raycast_miss(self):
        terrain = self._ramp()
        o = (jnp.zeros(1), jnp.zeros(1), jnp.full((1,), 10.0))
        d = (jnp.zeros(1), jnp.zeros(1), jnp.ones(1))  # straight up
        t, n, hit = hf.raycast(terrain, o, d, tmax=20.0)
        assert not bool(hit[0])


@pytest.fixture(scope="module")
def escape_task():
    from sgqn_carla_tpu.physics.domains import load

    return load("quadruped", "escape")


class TestEscape:
    def test_model_has_hfield(self, escape_task):
        m = escape_task.model
        assert m.hfield_geom >= 0
        assert len(m.hfield_pairs) > 0
        # all four toes collide with the terrain
        toe_ids = {i for i, g in enumerate(m.geoms)
                   if g.name.startswith("toe_")}
        hpair_ids = {gid for gid, _ in m.hfield_pairs}
        assert toe_ids <= hpair_ids

    def test_spawn_on_terrain_and_steps(self, escape_task):
        t = escape_task
        s = t.init(jax.random.PRNGKey(0))
        terrain = s.task_aux["terrain"]
        assert terrain.shape == (hf.RES, hf.RES)
        h0, _ = hf.sample(terrain, s.qpos[0], s.qpos[1])
        assert float(s.qpos[2]) > float(h0)  # spawned above the surface
        step = jax.jit(t.step)
        a = jnp.zeros(t.action_size)
        for _ in range(5):
            s = step(s, a)
        # settled near the surface, not fallen through, all finite
        h, _ = hf.sample(terrain, s.qpos[0], s.qpos[1])
        assert float(s.qpos[2]) > float(h) - 0.1
        assert bool(jnp.isfinite(s.qpos).all())
        assert bool(jnp.isfinite(s.qvel).all())
        obs = t.observe(s)
        assert obs["rangefinder"].shape == (20,)
        assert bool(jnp.isfinite(obs["rangefinder"]).all())
        r = t.reward(s, a)
        assert 0.0 <= float(r) <= 1.0
        # contact_force covers regular pairs + hfield rows
        assert s.contact_force.shape == (
            len(t.model.contact_pairs) + len(t.model.hfield_pairs),)

    def test_terrain_contact_supports(self, escape_task):
        """On the rim slope the robot must be held by terrain forces, not
        the z=0 floor plane (which is far below the rim surface)."""
        t = escape_task
        s = t.init(jax.random.PRNGKey(4))
        # move the robot over the rim (x = half radius → bowl ≈ 1),
        # preserving the spawn's ground clearance
        terrain = s.task_aux["terrain"]
        h0, _ = hf.sample(terrain, s.qpos[0], s.qpos[1])
        x_rim = hf.TERRAIN_HALF / 2
        h_rim, _ = hf.sample(terrain, jnp.float32(x_rim), jnp.float32(0.0))
        qpos = s.qpos.at[0].set(x_rim).at[2].add(float(h_rim) - float(h0))
        s = s.replace(qpos=qpos)
        step = jax.jit(t.step)
        a = jnp.zeros(t.action_size)
        npair = len(t.model.contact_pairs)
        max_terrain_force = 0.0
        for _ in range(20):
            s = step(s, a)
            max_terrain_force = max(max_terrain_force,
                                    float(s.contact_force[npair:].max()))
            h, _ = hf.sample(terrain, s.qpos[0], s.qpos[1])
            # never falls through the surface (torso root stays above it)
            assert float(s.qpos[2]) > float(h) - 0.3
        assert max_terrain_force > 0.0  # held by terrain, not the z=0 floor
        h, _ = hf.sample(terrain, s.qpos[0], s.qpos[1])
        assert float(h) > 0.5           # still on elevated terrain

    def test_render_shows_terrain(self, escape_task):
        from sgqn_carla_tpu.physics import engine
        from sgqn_carla_tpu.render.cameras import camera_pose
        from sgqn_carla_tpu.render.raster import default_appearance
        from sgqn_carla_tpu.render.fast import render_scene_fast

        t = escape_task
        s = t.init(jax.random.PRNGKey(5))
        kin = engine.forward_kinematics(t.model, s.qpos, s.qvel)
        cam = camera_pose(t.model, t.camera_id, kin)
        Rg, pg = engine.geom_world(t.model, kin)
        app = default_appearance(t.model)
        rgb, depth, seg = render_scene_fast(
            t.model, Rg, pg, app, cam, 48, 48,
            hfield=s.task_aux["terrain"])
        seg = np.asarray(seg)
        assert (seg == t.model.hfield_geom).sum() > 10  # terrain visible
        assert np.asarray(rgb).dtype == np.uint8
