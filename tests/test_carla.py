"""CARLA twin tests: dynamics, reward semantics, weather ODEs, rendering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.envs.carla_twin import (
    CarlaTwinEnv, _R, _storm_tick, _sun_tick, make_carla_env,
)


@pytest.fixture(scope="module")
def env():
    return CarlaTwinEnv(episode_length=40, action_repeat=4, image_size=64)


class TestWeather:
    def test_storm_ode_matches_reference_clamps(self):
        # reference: carla_wrapper.py:593-618
        t, inc = jnp.float32(-50.0), jnp.float32(1.0)
        for _ in range(100):
            t, inc, clouds, rain, fog = _storm_tick(t, inc, 1.0)
        assert 0 <= float(clouds) <= 60
        assert 0 <= float(rain) <= 80
        assert 0 <= float(fog) <= 30
        # increasing until +100 then decreasing
        t2, inc2, *_ = _storm_tick(jnp.float32(100.0), jnp.float32(1.0), 1.0)
        assert float(inc2) == 0.0

    def test_sun_altitude_band(self):
        t, az = jnp.float32(0.0), jnp.float32(0.0)
        alts = []
        for _ in range(400):
            t, az, alt = _sun_tick(t, az, 1.0)
            alts.append(float(alt))
        assert min(alts) >= 19.9 and max(alts) <= 90.1


class TestDynamics:
    def test_reset_and_step_shapes(self, env):
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (9, 64, 64) and obs.dtype == jnp.uint8
        state, res = jax.jit(env.step)(state, jnp.asarray([1.0, 0.0]))
        assert res.obs.shape == (9, 64, 64)
        assert np.isfinite(float(res.reward))

    def test_throttle_accelerates(self, env):
        state, _ = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(5):
            state, _ = step(state, jnp.asarray([1.0, 0.0]))
        assert float(state.speed) > 1.0

    def test_brake_stops(self, env):
        state, _ = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(5):
            state, _ = step(state, jnp.asarray([1.0, 0.0]))
        for _ in range(10):
            state, _ = step(state, jnp.asarray([-1.0, 0.0]))
        assert float(state.speed) < 0.2

    def test_on_road_reward_near_zero(self, env):
        """On the centerline the waypoint reward term ≈ 0 (−100·dist)."""
        state, _ = env.reset(jax.random.PRNGKey(0))
        _, res = env.step(state, jnp.asarray([0.0, 0.0]))
        assert float(res.reward) > -60.0

    def test_driving_off_road_penalized(self, env):
        state, _ = env.reset(jax.random.PRNGKey(0))
        # teleport off the road
        state = state.replace(pos=jnp.asarray([_R + 8.0, 0.0]),
                              yaw=jnp.float32(0.0))
        _, res = env.step(state, jnp.asarray([0.0, 0.0]))
        assert float(res.reward) < -400.0

    def test_collision_respawns_on_ring(self, env):
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = state.replace(pos=jnp.asarray([_R + 13.0, 0.0]))  # building hit
        state2, res = env.step(state, jnp.asarray([0.0, 0.0]))
        assert float(state2.collision) == 1.0
        r = float(jnp.linalg.norm(state2.pos))
        assert abs(r - _R) < 1.0  # back on the ring

    def test_time_limit(self):
        env = CarlaTwinEnv(episode_length=8, action_repeat=4, image_size=32)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, r1 = env.step(state, jnp.zeros(2))
        state, r2 = env.step(state, jnp.zeros(2))
        assert not bool(r1.done) and bool(r2.done)

    def test_vmap_batch(self, env):
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        states, obs = jax.vmap(env.reset)(keys)
        acts = jnp.tile(jnp.asarray([0.5, 0.1]), (4, 1))
        states, res = jax.jit(jax.vmap(env.step))(states, acts)
        assert res.obs.shape == (4, 9, 64, 64)


class TestVisuals:
    def test_scene_has_road_and_sky(self, env):
        state, obs = env.reset(jax.random.PRNGKey(1))
        img = np.asarray(obs[-3:]).transpose(1, 2, 0)
        # top of frame (sky) should differ from bottom (road)
        assert abs(int(img[:8].mean()) - int(img[-8:].mean())) > 5

    def test_color_mode_blends(self):
        e1 = make_carla_env(mode="train", image_size=48, episode_length=8)
        e2 = make_carla_env(mode="color_easy", image_size=48, episode_length=8)
        _, o1 = e1.reset(jax.random.PRNGKey(0))
        _, o2 = e2.reset(jax.random.PRNGKey(0))
        assert (np.asarray(o1) != np.asarray(o2)).mean() > 0.3

    def test_render_eval(self, env):
        state, _ = env.reset(jax.random.PRNGKey(0))
        frame = env.render_eval(state, 128)
        assert frame.shape == (128, 128, 3)
