"""Replay buffer + augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.data.overlay import get_overlay_pool
from sgqn_carla_tpu.data.replay import ReplayBuffer
from sgqn_carla_tpu.ops import augment


def _buffer(num_envs=2, T=5, num_eps_cap=3, size=16, A=2, policy="fifo"):
    return ReplayBuffer(num_envs=num_envs, episode_len=T,
                        capacity=num_envs * T * num_eps_cap,
                        image_size=size, action_size=A, batch_size=8,
                        policy=policy)


def _fill_episode(buf, state, ep_value):
    E, T = buf.num_envs, buf.T
    s = buf.image_size
    obs = jnp.full((E, 9, s, s), ep_value, jnp.uint8)
    state = buf.add_reset(state, obs)
    for t in range(T):
        next_obs = jnp.full((E, 9, s, s), ep_value * 10 + t + 1, jnp.uint8)
        state = buf.add(state,
                        jnp.full((E, buf.action_size), float(t)),
                        jnp.full((E,), float(t)),
                        next_obs)
    return state


class TestVideoPool:
    """data/videos.py hard-pool dominant-color statistics (round-4 verdict
    item #3): the default "dmcgb" band excludes saturated-warm dominant
    colors (real DAVIS clips rarely have one — the uniform pool's ~19%
    warm-camouflage excess was the measured source of the video_hard
    bimodality); "harsh" preserves the original pool bit-for-bit."""

    def test_dmcgb_band_excludes_warm_dominants(self):
        from sgqn_carla_tpu.data.videos import _hard_base, _is_warm_saturated

        rng = np.random.RandomState(7)
        for v in range(500):
            base = _hard_base(rng, "dmcgb", seed=7, v=v)
            assert not _is_warm_saturated(base), (v, base)

    def test_harsh_band_keeps_warm_dominants(self):
        from sgqn_carla_tpu.data.videos import _hard_base, _is_warm_saturated

        rng = np.random.RandomState(7)
        warm = sum(
            bool(_is_warm_saturated(_hard_base(rng, "harsh", seed=7, v=v)))
            for v in range(500))
        assert 40 <= warm <= 180  # uniform bases: ~19% in the warm band

    def test_non_warm_clips_identical_across_bands(self):
        from sgqn_carla_tpu.data.videos import synth_videos

        a = synth_videos(40, num_frames=4, height=16, width=16, seed=7,
                         band="dmcgb")
        b = synth_videos(40, num_frames=4, height=16, width=16, seed=7,
                         band="harsh")
        same = sum(int((a[v] == b[v]).all()) for v in range(40))
        assert same >= 25  # only resampled (warm) clips may differ

    def test_warm_detector_on_walker_body_color(self):
        from sgqn_carla_tpu.data.videos import _is_warm_saturated

        assert _is_warm_saturated(np.array([0.8, 0.43, 0.38]))   # body
        assert _is_warm_saturated(np.array([0.77, 0.44, 0.41]))  # pool #24
        assert not _is_warm_saturated(np.array([0.3, 0.5, 0.8]))  # sky
        assert not _is_warm_saturated(np.array([0.5, 0.5, 0.5]))  # gray


class TestReplay:
    def test_fill_and_sample_shapes(self):
        buf = _buffer()
        state = buf.init()
        state = _fill_episode(buf, state, 1)
        assert int(state.num_eps) == 1
        batch = buf.sample_raw(state, jax.random.PRNGKey(0))
        assert batch.obs.shape == (8, 9, 16, 16)
        assert batch.next_obs.shape == (8, 9, 16, 16)
        assert batch.action.shape == (8, 2)
        assert batch.reward.shape == (8, 1)
        assert (np.asarray(batch.not_done) == 1.0).all()

    def test_transition_alignment(self):
        """next_obs newest frame must be the frame following obs's."""
        buf = _buffer()
        state = buf.init()
        state = _fill_episode(buf, state, 2)
        env_i = jnp.zeros(4, jnp.int32)
        ep_i = jnp.zeros(4, jnp.int32)
        s = jnp.arange(1, 5)
        obs = jax.vmap(buf._stack, in_axes=(None, 0, 0, 0))(state, env_i, ep_i, s)
        nxt = jax.vmap(buf._stack, in_axes=(None, 0, 0, 0))(state, env_i, ep_i, s + 1)
        # action stored at step s is float(s) ⇒ reward r[s] == s; frames:
        # frame at index t (t>0) has value 2*10 + t
        for k in range(4):
            t = int(s[k])
            assert int(np.asarray(obs)[k, -1, 0, 0]) == 20 + t
            assert int(np.asarray(nxt)[k, -1, 0, 0]) == 20 + t + 1

    def test_episode_start_clamping(self):
        """Stack at s=0 repeats the initial frame (FrameStack reset fill)."""
        buf = _buffer()
        state = buf.init()
        state = _fill_episode(buf, state, 3)
        stack = buf._stack(state, 0, 0, jnp.int32(0))
        a = np.asarray(stack)
        assert (a[:3] == a[3:6]).all() and (a[3:6] == a[6:9]).all()
        assert int(a[0, 0, 0]) == 3  # the reset frame value

    def test_ring_overwrite(self):
        buf = _buffer(num_eps_cap=3)
        state = buf.init()
        for ep in range(5):
            state = _fill_episode(buf, state, ep + 1)
        assert int(state.num_eps) == 3
        # in-progress slot excluded: all sampled rewards must be well-formed
        batch = buf.sample_raw(state, jax.random.PRNGKey(1), 64)
        assert np.isfinite(np.asarray(batch.reward)).all()

    def test_full_ring_never_samples_write_head(self):
        """Regression (round-1 VERDICT weak #1): with the ring full, sampled
        episode indices must never equal ep_ptr — the slot being
        overwritten — else samples mix fresh and stale frames."""
        buf = _buffer(num_eps_cap=3)
        state = buf.init()
        for ep in range(4):  # fill past capacity → ring full
            state = _fill_episode(buf, state, ep + 1)
        # start writing a new (in-progress) episode into the ep_ptr slot
        state = buf.add_reset(
            state, jnp.full((2, 9, 16, 16), 200, jnp.uint8))
        state = buf.add(state, jnp.zeros((2, 2)), jnp.zeros(2),
                        jnp.full((2, 9, 16, 16), 201, jnp.uint8))
        assert int(state.num_eps) == 3
        for seed in range(20):
            _, ep_i, _ = buf.sample_idx(state, jax.random.PRNGKey(seed), 256)
            assert not np.any(np.asarray(ep_i) == int(state.ep_ptr))

    def test_slot_ep_stamps_and_idx_provenance(self):
        """Burst-forensics support: each completed slot carries the episode
        ordinal it was written at (age = ep_counter − slot_ep), and
        sample_raw's Batch.idx provenance decodes back to the sampled
        transition (same gather the sampler itself performs)."""
        buf = _buffer(num_eps_cap=3)
        state = buf.init()
        assert state.slot_ep.shape == (2, buf.num_episodes)
        for ep in range(5):  # two wraps
            state = _fill_episode(buf, state, ep + 1)
        assert int(state.ep_counter) == 5
        se = np.asarray(state.slot_ep)
        # lockstep envs share slots → identical rows; all stamped 1-based
        assert (se[0] == se[1]).all()
        assert sorted(se[0].tolist()) == [3, 4, 5]  # last 3 completions
        batch = buf.sample_raw(state, jax.random.PRNGKey(3), 32)
        assert batch.idx.shape == (32, 3)
        idx = np.asarray(batch.idx)
        obs = jax.vmap(buf._stack, in_axes=(None, 0, 0, 0))(
            state, batch.idx[:, 0], batch.idx[:, 1], batch.idx[:, 2])
        np.testing.assert_array_equal(np.asarray(obs), np.asarray(batch.obs))
        ages = int(state.ep_counter) - se[0][idx[:, 1]]
        assert (ages >= 0).all() and (ages <= 2).all()

    def test_full_wrap_sample_consistency(self):
        """Exhaustive cross-consistency through many ring wraps with
        mid-episode sampling (the fused trainer's regime): every sampled
        transition's obs frame, action, reward, and next_obs frame must
        decode to the SAME (global episode, step), the episode must be
        within the ring's retention window, and obs/next_obs must come
        from the same env — any fresh/stale mixing poisons the critic."""
        E, T, N = 16, 5, 3
        buf = _buffer(num_envs=E, T=T, num_eps_cap=N, size=8, A=1)
        state = buf.init()
        s = buf.image_size

        def frame(ep, t):
            # pixel [0,0,0] encodes (ep, t); pixel [0,0,1] encodes env
            f = np.zeros((E, 9, s, s), np.uint8)
            f[:, -3, 0, 0] = ep * (T + 1) + t
            f[:, -3, 0, 1] = np.arange(E)
            return jnp.asarray(f)

        rng = jax.random.PRNGKey(0)
        completed = -1  # newest completed global episode
        for ep in range(12):  # 4 full wraps of the 3-slot ring
            state = buf.add_reset(state, frame(ep, 0))
            for t in range(T):
                state = buf.add(
                    state, jnp.full((E, 1), float(ep * T + t)),
                    jnp.full((E,), float(ep * T + t)), frame(ep, t + 1))
                # the final add of an episode completes it immediately
                if t == T - 1:
                    completed = ep
                if completed >= 0:  # sample mid-episode, like the trainer
                    rng, k = jax.random.split(rng)
                    b = buf.sample_raw(state, k, 64)
                    code_o = np.asarray(b.obs)[:, -3, 0, 0].astype(int)
                    code_n = np.asarray(b.next_obs)[:, -3, 0, 0].astype(int)
                    env_o = np.asarray(b.obs)[:, -3, 0, 1].astype(int)
                    env_n = np.asarray(b.next_obs)[:, -3, 0, 1].astype(int)
                    act = np.asarray(b.action)[:, 0].astype(int)
                    rew = np.asarray(b.reward)[:, 0].astype(int)
                    ep_a, s_a = act // T, act % T
                    ep_o, s_o = code_o // (T + 1), code_o % (T + 1)
                    # same transition across all four fields
                    assert (ep_o == ep_a).all() and (s_o == s_a).all()
                    assert (code_n == code_o + 1).all()
                    assert (rew == act).all()
                    assert (env_o == env_n).all()
                    # retention window: only intact completed episodes
                    lo = max(completed - (N - 2), 0)
                    assert (ep_a >= lo).all() and (ep_a <= completed).all()

    def test_reservoir_retains_old_episodes(self):
        """Reservoir slot replacement: after many episodes some slot must
        still hold an episode older than the FIFO horizon, samples must
        stay internally consistent, and the write-head slot excluded."""
        E, T, N = 2, 5, 4
        buf = _buffer(num_envs=E, T=T, num_eps_cap=N, size=8, A=1,
                      policy="reservoir")
        state = buf.init()
        s = buf.image_size
        add = jax.jit(buf.add)
        max_age = 0
        for ep in range(24):
            f0 = np.zeros((E, 9, s, s), np.uint8)
            f0[:, -3, 0, 0] = ep * (T + 1)
            state = buf.add_reset(state, jnp.asarray(f0))
            for t in range(T):
                f = np.zeros((E, 9, s, s), np.uint8)
                f[:, -3, 0, 0] = ep * (T + 1) + t + 1
                state = add(state, jnp.full((E, 1), float(ep * T + t)),
                            jnp.full((E,), float(ep * T + t)),
                            jnp.asarray(f))
            # decode which global episode each slot retains right now
            codes = np.asarray(state.frames)[0, :, 0, 0, 0, 0].astype(int)
            max_age = max(max_age, ep - (codes // (T + 1)).min())
        # FIFO age never exceeds N-1; the reservoir tail must
        assert max_age > N, max_age
        codes = np.asarray(state.frames)[0, :, 0, 0, 0, 0].astype(int)
        eps_held = codes // (T + 1)
        # consistency of sampled transitions (episode slots are random now)
        b = buf.sample_raw(state, jax.random.PRNGKey(3), 128)
        code_o = np.asarray(b.obs)[:, -3, 0, 0].astype(int)
        code_n = np.asarray(b.next_obs)[:, -3, 0, 0].astype(int)
        act = np.asarray(b.action)[:, 0].astype(int)
        assert (code_n == code_o + 1).all()
        assert (code_o // (T + 1) == act // T).all()
        assert (code_o % (T + 1) == act % T).all()
        # sampled episodes must be retained, non-write-head episodes
        held = set(eps_held.tolist()) - {int(eps_held[int(state.ep_ptr)])}
        assert set((code_o // (T + 1)).tolist()) <= held

    def test_jit_add_and_sample(self):
        buf = _buffer()
        state = buf.init()
        add = jax.jit(buf.add)
        state = buf.add_reset(state, jnp.zeros((2, 9, 16, 16), jnp.uint8))
        for t in range(buf.T):
            state = add(state, jnp.zeros((2, 2)), jnp.zeros(2),
                        jnp.zeros((2, 9, 16, 16), jnp.uint8))
        sample = jax.jit(lambda st, k: buf.sample_raw(st, k))
        b = sample(state, jax.random.PRNGKey(0))
        assert b.obs.shape == (8, 9, 16, 16)


class TestAugment:
    def test_random_crop(self):
        imgs = jnp.arange(2 * 9 * 100 * 100, dtype=jnp.uint8).reshape(2, 9, 100, 100)
        out = augment.random_crop(jax.random.PRNGKey(0), imgs, 84)
        assert out.shape == (2, 9, 84, 84)

    def test_random_crop_noop_when_same_size(self):
        imgs = jnp.zeros((2, 9, 84, 84), jnp.uint8)
        out = augment.random_crop(jax.random.PRNGKey(0), imgs, 84)
        assert out.shape == (2, 9, 84, 84)

    def test_center_crop(self):
        imgs = jnp.zeros((2, 9, 100, 100))
        assert augment.center_crop(imgs, 84).shape == (2, 9, 84, 84)

    def test_random_shift_preserves_shape_and_range(self):
        imgs = jnp.full((4, 9, 84, 84), 128, jnp.uint8)
        out = augment.random_shift(jax.random.PRNGKey(0), imgs)
        assert out.shape == (4, 9, 84, 84)
        assert (np.asarray(out) == 128).all()  # constant image unchanged

    def test_random_overlay_range(self):
        pool = jnp.asarray(get_overlay_pool(84, 84, seed=0, num=8))
        imgs = jnp.full((4, 9, 84, 84), 255, jnp.uint8)
        out = augment.random_overlay(jax.random.PRNGKey(0), imgs, pool,
                                     alpha_blending=0.5)
        a = np.asarray(out)
        assert a.shape == (4, 9, 84, 84)
        assert a.min() >= 0 and a.max() <= 255
        assert a.std() > 1.0  # overlay visible

    def test_overlay_band_flag(self):
        # narrow (default) must stay bit-stable: every committed
        # generalization result was trained on this pool, and the wide
        # band is opt-in (measured negative as a default — docs/PERF.md)
        narrow = get_overlay_pool(84, 84, seed=0, num=4)
        default = get_overlay_pool(84, 84, seed=0, num=4, band="narrow")
        wide = get_overlay_pool(84, 84, seed=0, num=4, band="wide")
        assert np.array_equal(narrow, default)
        assert not np.array_equal(narrow, wide)
        assert wide.shape == narrow.shape
        assert wide.min() >= 0.0 and wide.max() <= 1.0

    def test_overlay_band_palette_dominant_colors(self):
        # palette band: per-image dominant color must span the gamut
        # (narrow/wide always average ≈0.5 gray — which is exactly why
        # robot-colored video_hard clips camouflage the agent, see
        # data/overlay.py docstring). Mean per-image color spread must be
        # several times the narrow pool's.
        narrow = get_overlay_pool(84, 84, seed=0, num=32, band="narrow")
        pal = get_overlay_pool(84, 84, seed=0, num=32, band="palette")
        assert pal.shape == narrow.shape
        assert pal.min() >= 0.0 and pal.max() <= 1.0
        n_means = narrow.mean(axis=(2, 3))  # (N, 3) dominant colors
        p_means = pal.mean(axis=(2, 3))
        assert p_means.std(axis=0).mean() > 2.0 * n_means.std(axis=0).mean()
        # the pool covers warm body-like tones (r >> b) AND cool tones
        assert ((p_means[:, 0] - p_means[:, 2]) > 0.2).any()
        assert ((p_means[:, 2] - p_means[:, 0]) > 0.2).any()
        # mix: half gray-based (clean-task learning speed), half palette
        mix = get_overlay_pool(84, 84, seed=0, num=32, band="mix")
        m_means = mix.mean(axis=(2, 3))
        gray = (np.abs(m_means - 0.5) < 0.12).all(axis=1).sum()
        assert 8 <= gray <= 24  # p=0.5 split, loose binomial bounds
        assert m_means.std(axis=0).mean() > 1.5 * n_means.std(axis=0).mean()

    def test_attribution_augmentation_keeps_salient(self):
        pool = jnp.asarray(get_overlay_pool(84, 84, seed=0, num=8))
        imgs = jnp.full((2, 9, 84, 84), 200, jnp.float32)
        mask = jnp.zeros((2, 9, 84, 84), jnp.float32).at[:, :, :42].set(1.0)
        out = augment.attribution_augmentation(jax.random.PRNGKey(0), imgs,
                                               mask, pool)
        a = np.asarray(out)
        assert (a[:, :, :42] == 200).all()      # salient pixels kept
        assert (a[:, :, 42:] != 200).any()      # rest replaced

    def test_random_conv(self):
        imgs = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (2, 9, 84, 84)),
            jnp.uint8)
        out = augment.random_conv(jax.random.PRNGKey(0), imgs)
        assert out.shape == (2, 9, 84, 84)
        a = np.asarray(out)
        assert a.min() >= 0 and a.max() <= 255

    def test_random_affine_pairs_with_mask(self):
        """The same sampled warp applies to image and mask (paired_aug
        invariant, reference: augmentations.py:138)."""
        imgs = jnp.zeros((3, 3, 84, 84), jnp.float32).at[:, :, 30:54,
                                                         30:54].set(255.0)
        out, inv = augment.random_affine(jax.random.PRNGKey(4), imgs)
        replay = augment.affine_apply(imgs, inv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(replay))
        a = np.asarray(out)
        assert a.shape == (3, 3, 84, 84)
        assert not np.allclose(a, np.asarray(imgs))  # actually warped

    def test_random_erasing(self):
        imgs = jnp.full((8, 3, 84, 84), 100.0, jnp.float32)
        out, keep = augment.random_erasing(jax.random.PRNGKey(1), imgs, p=1.0)
        a = np.asarray(out)
        k = np.asarray(keep)
        assert ((a == 0) == (k == 0)).all()
        assert (a == 0).any() and (a == 100).any()

    def test_paired_aug(self):
        pool = jnp.asarray(get_overlay_pool(84, 84, seed=0, num=8))
        obs = jnp.full((4, 9, 84, 84), 180, jnp.uint8)
        mask = jnp.zeros((4, 9, 84, 84), jnp.float32).at[:, :, :42].set(1.0)
        img_out, mask_out = augment.paired_aug(jax.random.PRNGKey(2), obs,
                                               mask, pool)
        assert img_out.shape == obs.shape and mask_out.shape == mask.shape
        a = np.asarray(img_out)
        assert a.min() >= 0 and a.max() <= 255
        m = np.asarray(mask_out)
        assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6

    def test_attribution_random_patch_augmentation(self):
        pool = jnp.asarray(get_overlay_pool(84, 84, seed=0, num=8))
        x = jnp.full((4, 9, 84, 84), 200.0, jnp.float32)
        # graded saliency: cell (3,3) strictly hottest, distinct cell values
        ramp = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
        cam = jnp.repeat(jnp.repeat(ramp, 21, 0), 21, 1)[None].repeat(4, 0)
        out = augment.attribution_random_patch_augmentation(
            jax.random.PRNGKey(3), x, cam, pool, patch_proba=1.0)
        a = np.asarray(out)
        # the hottest cell survives the 0.9-quantile cut and proba-1 keep
        assert (a[:, :, 63:, 63:] == 200.0).all()
        # the coldest cell is below the quantile → dataset fill shows through
        assert (a[:, :, :21, :21] != 200.0).any()

    def test_prepare_pad_batch(self):
        obs = jnp.zeros((9, 100, 100), jnp.uint8)
        nxt = jnp.zeros((9, 100, 100), jnp.uint8)
        act = jnp.zeros(2)
        b_obs, b_next, b_act = augment.prepare_pad_batch(
            jax.random.PRNGKey(0), obs, nxt, act, batch_size=16)
        assert b_obs.shape == (16, 9, 84, 84)
        assert b_act.shape == (16, 2)
