"""Env layer tests: modes, frame stack, action repeat, vectorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.envs import make_env
from sgqn_carla_tpu.envs.vector import VectorEnv


def _env(mode="train", **kw):
    kw.setdefault("image_size", 84)
    kw.setdefault("episode_length", 40)  # short episodes for tests
    return make_env("cartpole", "balance", mode=mode, **kw)


class TestDMCPixelEnv:
    def test_reset_obs_shape(self):
        env = _env()
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (9, 84, 84) and obs.dtype == jnp.uint8
        # frame stack filled with copies on reset (reference FrameStack.reset)
        np.testing.assert_array_equal(np.asarray(obs[:3]), np.asarray(obs[3:6]))

    def test_step_advances_stack(self):
        env = _env()
        state, obs0 = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        state, res = step(state, jnp.ones(1))
        # newest frame is at the end; oldest dropped
        np.testing.assert_array_equal(np.asarray(res.obs[:3]),
                                      np.asarray(obs0[3:6]))
        assert float(res.reward) >= 0.0
        assert not bool(res.done)

    def test_action_repeat_reward_sum(self):
        env = _env(action_repeat=4)
        state, _ = env.reset(jax.random.PRNGKey(0))
        _, res = env.step(state, jnp.zeros(1))
        # balance reward ≈ 1 per control step × 4 repeats
        assert 2.0 < float(res.reward) <= 4.0

    def test_time_limit(self):
        env = _env(episode_length=8, action_repeat=4)
        assert env.max_episode_steps == 2
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, r1 = env.step(state, jnp.zeros(1))
        assert not bool(r1.done)
        state, r2 = env.step(state, jnp.zeros(1))
        assert bool(r2.done)

    def test_color_modes_change_appearance(self):
        env = _env(mode="color_hard")
        s1, o1 = env.reset(jax.random.PRNGKey(0))
        s2, o2 = env.reset(jax.random.PRNGKey(9))
        # different episodes → different colors → different pixels
        assert (np.asarray(o1) != np.asarray(o2)).mean() > 0.1

    def test_color_easy_close_to_train(self):
        et = _env(mode="train")
        ec = _env(mode="color_easy")
        _, ot = et.reset(jax.random.PRNGKey(0))
        _, oc = ec.reset(jax.random.PRNGKey(0))
        # same physics init (same seed path) → scene differs only mildly
        diff = np.abs(np.asarray(ot, np.int32) - np.asarray(oc, np.int32)).mean()
        assert diff < 40.0

    def test_color_hard_calibrated_to_field_deltas(self):
        """Round-3 calibration (VERDICT item 5): hard rows stay anchored to
        the scene defaults (±0.5/channel, reference DMCGB-style jitter of
        the settings.py field set) instead of full-range uniform colors
        that can camouflage the body against the floor."""
        from sgqn_carla_tpu.data.colors import (_DEFAULTS, _FIELDS,
                                                make_color_table)
        easy = make_color_table("color_easy")
        hard = make_color_table("color_hard")
        for f in _FIELDS:
            d = _DEFAULTS[f][None]
            de = np.abs(np.asarray(easy[f]) - d)
            dh = np.abs(np.asarray(hard[f]) - d)
            assert de.max() <= 0.1 + 1e-6, f
            assert dh.max() <= 0.5 + 1e-6, f          # default-anchored
            assert de.mean() < dh.mean(), f           # easy < hard harshness

    def test_color_harshness_ordering_on_frames(self):
        """easy frames sit closer to the train scene than hard frames
        (fixed physics seed ⇒ pixel diff measures only the recolor)."""
        _, ot = _env(mode="train").reset(jax.random.PRNGKey(0))
        _, oe = _env(mode="color_easy").reset(jax.random.PRNGKey(0))
        _, oh = _env(mode="color_hard").reset(jax.random.PRNGKey(0))
        ot = np.asarray(ot, np.int32)
        de = np.abs(ot - np.asarray(oe, np.int32)).mean()
        dh = np.abs(ot - np.asarray(oh, np.int32)).mean()
        assert de < dh

    def test_video_mode_composites_and_animates(self):
        env = _env(mode="video_easy")
        state, o0 = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        state, r1 = step(state, jnp.zeros(1))
        state, r2 = step(state, jnp.zeros(1))
        # background animates between steps even with a frozen-ish scene
        assert (np.asarray(r1.obs[6:]) != np.asarray(r2.obs[6:])).any()

    def test_video_hard_differs_from_easy(self):
        ee = _env(mode="video_easy")
        eh = _env(mode="video_hard")
        _, oe = ee.reset(jax.random.PRNGKey(0))
        _, oh = eh.reset(jax.random.PRNGKey(0))
        assert (np.asarray(oe) != np.asarray(oh)).any()

    def test_render_eval_448(self):
        env = _env(mode="video_easy")
        state, _ = env.reset(jax.random.PRNGKey(0))
        frame = env.render_eval(state, 448)
        assert frame.shape == (448, 448, 3)


class TestVectorEnv:
    def test_batch_step(self):
        venv = VectorEnv(_env(), num_envs=8)
        states, obs = venv.reset(jax.random.PRNGKey(0))
        assert obs.shape == (8, 9, 84, 84)
        actions = jnp.zeros((8, 1))
        states, res = jax.jit(venv.step)(states, actions)
        assert res.obs.shape == (8, 9, 84, 84)
        assert res.reward.shape == (8,)
        # envs initialized differently
        assert (np.asarray(res.obs[0]) != np.asarray(res.obs[1])).any()

    def test_autoreset(self):
        venv = VectorEnv(_env(episode_length=4, action_repeat=4), num_envs=4)
        states, _ = venv.reset(jax.random.PRNGKey(0))
        states, res = venv.step_autoreset(states, jnp.zeros((4, 1)))
        assert bool(res.done.all())
        assert int(states.step_i.max()) == 0  # everyone re-initialized
