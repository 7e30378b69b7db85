"""Host-spill replay tests (data/spill.py, --replay_spill host).

The spill restores the reference's full-capacity recency window
(reference: src/train.py:148-153) behind the HBM working set; these tests
pin the exchange mechanics (D2H spill, H2D refresh, FIFO host window) and
drive the flag end-to-end through the training CLI loop.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.core.config import Config
from sgqn_carla_tpu.data.replay import ReplayBuffer
from sgqn_carla_tpu.data.spill import HostSpill
from sgqn_carla_tpu.train.loop import run_training, work_dir_for

E, T, S, A = 2, 4, 8, 2  # envs, steps/episode, image, action dims


def _buffer(capacity=24):
    return ReplayBuffer(num_envs=E, episode_len=T, capacity=capacity,
                        image_size=S, action_size=A, batch_size=4)


def _write_episode(buffer, rstate, ep_id: int):
    """One lockstep episode whose every frame pixel == ep_id (uint8)."""
    obs = jnp.full((E, 9, S, S), ep_id, jnp.uint8)
    rstate = buffer.add_reset(rstate, obs)
    for t in range(T):
        rstate = buffer.add(rstate,
                            jnp.full((E, A), float(ep_id), jnp.float32),
                            jnp.full((E,), float(ep_id), jnp.float32), obs)
    return rstate


class TestHostSpill:
    def test_spill_and_fifo_window(self):
        buffer = _buffer()                       # 3 device episode slots
        spill = HostSpill(buffer, capacity=E * T * 10, refresh=0, seed=0)
        assert spill.num_host_episodes == 10
        rstate = buffer.init()
        for ep in range(12):                     # wraps the 10-slot host ring
            slot = int(rstate.ep_ptr)
            rstate = _write_episode(buffer, rstate, ep + 1)
            rstate = spill.after_chunk(rstate, slot)
        assert spill.n == 12
        assert spill.host_steps == 10 * T * E
        # FIFO window: episodes 3..12 survive (1, 2 overwritten by 11, 12)
        vals = sorted(int(spill.frames[0, i, 1, 0, 0, 0]) for i in range(10))
        assert vals == list(range(3, 13))
        # rewards/actions rode along with their episode
        for i in range(10):
            ep_val = float(spill.frames[0, i, 1, 0, 0, 0])
            assert float(spill.rewards[0, i, 0]) == ep_val
            assert float(spill.actions[0, i, 0, 0]) == ep_val

    def test_refresh_reinjects_old_episodes(self):
        buffer = _buffer()                       # 3 device slots → FIFO device
        spill = HostSpill(buffer, capacity=E * T * 50, refresh=2, seed=0)
        rstate = buffer.init()
        seen_old = False
        for ep in range(20):
            slot = int(rstate.ep_ptr)
            rstate = _write_episode(buffer, rstate, ep + 1)
            rstate = spill.after_chunk(rstate, slot)
            if ep >= 10:
                # device-FIFO alone would only hold the last 3 episodes;
                # with refresh the ring must show older host episodes
                dev_vals = np.asarray(rstate.frames[0, :, 1, 0, 0, 0])
                if (dev_vals[dev_vals > 0] < ep - 3).any():
                    seen_old = True
        assert seen_old, "refresh never injected an older host episode"

    def test_refresh_never_touches_write_slot(self):
        buffer = _buffer()
        spill = HostSpill(buffer, capacity=E * T * 50, refresh=2, seed=3)
        rstate = buffer.init()
        for ep in range(15):
            slot = int(rstate.ep_ptr)
            rstate = _write_episode(buffer, rstate, ep + 1)
            ptr_before = int(rstate.ep_ptr)
            marker = np.asarray(rstate.frames[:, ptr_before]).copy()
            rstate = spill.after_chunk(rstate, slot)
            np.testing.assert_array_equal(
                np.asarray(rstate.frames[:, ptr_before]), marker)

    def test_sampling_stays_valid_after_refresh(self):
        buffer = _buffer()
        spill = HostSpill(buffer, capacity=E * T * 50, refresh=2, seed=0)
        rstate = buffer.init()
        for ep in range(12):
            slot = int(rstate.ep_ptr)
            rstate = _write_episode(buffer, rstate, ep + 1)
            rstate = spill.after_chunk(rstate, slot)
        batch = buffer.sample_raw(rstate, jax.random.PRNGKey(0))
        # every sampled obs comes from SOME written episode: constant frames
        obs = np.asarray(batch.obs)
        assert obs.min() >= 1 and obs.max() <= 12
        # stacked frames within one sample agree (constant-valued episodes)
        assert (obs[:, :3] == obs[:, -3:]).all()

    def test_reset_drops_host_window(self):
        buffer = _buffer()
        spill = HostSpill(buffer, capacity=E * T * 10, refresh=2, seed=0)
        rstate = buffer.init()
        for ep in range(5):
            slot = int(rstate.ep_ptr)
            rstate = _write_episode(buffer, rstate, ep + 1)
            rstate = spill.after_chunk(rstate, slot)
        spill.reset()
        assert spill.n == 0 and spill.host_steps == 0


def test_training_loop_with_host_spill(tmp_path):
    """End-to-end: --replay_spill host with a device working set smaller
    than the full capacity; the run completes with finite metrics."""
    cfg = Config(
        domain_name="cartpole", task_name="balance", algorithm="sac",
        train_steps=12, init_steps=2, eval_freq=1000, save_freq=100,
        episode_length=8, action_repeat=4, eval_episodes=2, num_envs=2,
        batch_size=4, num_shared_layers=4, num_filters=8, hidden_dim=32,
        projection_dim=16, log_dir=str(tmp_path), seed=7, eval_mode=None,
        replay_spill="host", replay_capacity=16, replay_device_capacity=8,
    ).finalize()
    out = run_training(cfg)
    wd = work_dir_for(cfg)
    rows = [json.loads(l) for l in open(os.path.join(wd, "train.log"))]
    assert any("critic_loss" in r for r in rows)
    for v in out["final_metrics"].values():
        assert np.isfinite(v)


def test_spill_capacity_default_restores_reference():
    cfg = Config(train_steps=600_000, replay_spill="host").finalize()
    assert cfg.replay_capacity == 600_000  # reference train.py:148-153
    cfg2 = Config(train_steps=600_000).finalize()
    assert cfg2.replay_capacity == 100_000  # device-only HBM cap
