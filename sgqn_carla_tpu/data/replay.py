"""On-device replay buffer with index-based frame stacking.

The reference buffer keeps python lists of LazyFrames references on the host
and re-gathers + H2D-copies every sample (reference: src/utils.py:94-198,
obs stored as LazyFrames at :101-122, `_encode_obses` gather at :129-135 —
hot spot #4 in SURVEY §3). Here the buffer is a device-resident pytree:

  * frames are stored ONCE, unstacked, in an episode-aligned layout
    ``(num_envs, num_episodes, T+1, 3, H, W) uint8`` — the LazyFrames idea
    executed as pure indexing. DMC episodes are fixed length and lockstep
    across the vectorized env batch, so every step is one
    `dynamic_update_slice`, and frame stacks are gathered at sample time
    with start-of-episode clamping (matching FrameStack's reset fill);
  * sampling is uniform over (env, completed episode, step); the episode
    currently being written is excluded, so samples never straddle the
    write head;
  * `not_done` is constant 1.0: DMC never terminates early and the
    reference bootstraps through time limits
    (reference: src/train.py:233-236 `done_bool = 0` at the limit).

The buffer itself returns raw uint8 stacks; per-algorithm augmentation
(crop/shift/...) happens inside the agent's jitted update (ops/augment.py),
so sample→augment→gradient fuses into one XLA program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class ReplayState(struct.PyTreeNode):
    frames: jnp.ndarray    # (E, N, T+1, 3, H, W) uint8
    actions: jnp.ndarray   # (E, N, T, A) float32
    rewards: jnp.ndarray   # (E, N, T) float32
    ep_ptr: jnp.ndarray    # int32: episode slot currently being written
    step_ptr: jnp.ndarray  # int32: next step index within the episode
    num_eps: jnp.ndarray   # int32: completed episodes stored (≤ N)
    ep_counter: jnp.ndarray  # int32: total episodes ever started (slot policy)
    slot_ep: jnp.ndarray = None  # (E, N) int32: ep_counter value at which each
    #                              slot's episode completed (slot age =
    #                              ep_counter − slot_ep; burst forensics,
    #                              docs/PERF.md collapse-trigger hunt). Leading
    #                              dim E keeps the leaf under the same data-
    #                              axis sharding predicate as the other rings.


class Batch(struct.PyTreeNode):
    obs: jnp.ndarray       # (B, K*3, H, W) uint8
    action: jnp.ndarray    # (B, A)
    reward: jnp.ndarray    # (B, 1)
    next_obs: jnp.ndarray  # (B, K*3, H, W) uint8
    not_done: jnp.ndarray  # (B, 1)
    pos: jnp.ndarray = None  # CURL positive crops (reference: sample_curl)
    idx: jnp.ndarray = None  # (B, 3) int32 (env_i, ep_i, s) sample provenance
    #                          (burst forensics; None for custom samplers)


class ReplayBuffer:
    """Static configuration; all methods are pure state transformers."""

    def __init__(self, *, num_envs: int, episode_len: int, capacity: int,
                 image_size: int, action_size: int, frame_stack: int = 3,
                 batch_size: int = 128, policy: str = "fifo"):
        self.num_envs = num_envs
        self.T = episode_len  # wrapper steps per episode
        steps_per_env = max(capacity // max(num_envs, 1), episode_len)
        self.num_episodes = max(steps_per_env // episode_len, 2)
        self.image_size = image_size
        self.action_size = action_size
        self.frame_stack = frame_stack
        self.batch_size = batch_size
        # slot-replacement policy once the ring is full:
        #   "fifo"      — overwrite the oldest episode (reference semantics,
        #                 utils.py:124-127 `idx = (idx + 1) % capacity`);
        #   "reservoir" — overwrite a uniform-random slot. Expected retention
        #                 is still N episodes but with a geometric age tail,
        #                 so early diverse behavior survives long after FIFO
        #                 would have flushed it. At high env counts a FIFO
        #                 ring homogenizes to recent near-optimal data within
        #                 a few thousand updates, which precedes every
        #                 observed late-training Q-divergence collapse
        #                 (docs/PERF.md).
        assert policy in ("fifo", "reservoir"), policy
        self.policy = policy

    def init(self) -> ReplayState:
        E, N, T = self.num_envs, self.num_episodes, self.T
        s = self.image_size
        return ReplayState(
            frames=jnp.zeros((E, N, T + 1, 3, s, s), jnp.uint8),
            actions=jnp.zeros((E, N, T, self.action_size), jnp.float32),
            rewards=jnp.zeros((E, N, T), jnp.float32),
            ep_ptr=jnp.int32(0),
            step_ptr=jnp.int32(0),
            num_eps=jnp.int32(0),
            ep_counter=jnp.int32(0),
            slot_ep=jnp.zeros((E, N), jnp.int32),
        )

    # -- writing -------------------------------------------------------------
    def add_reset(self, state: ReplayState, obs0: jnp.ndarray) -> ReplayState:
        """Record episode-initial frames. obs0: (E, K*3, H, W) stacked obs;
        only the newest frame (last 3 channels) is stored."""
        frame0 = obs0[:, -3:]  # (E, 3, H, W)
        frames = jax.vmap(
            lambda f, fr: jax.lax.dynamic_update_slice(
                f, fr[None, None], (state.ep_ptr, jnp.int32(0), 0, 0, 0)),
        )(state.frames, frame0)
        return state.replace(frames=frames, step_ptr=jnp.int32(0))

    def add(self, state: ReplayState, action, reward, next_obs) -> ReplayState:
        """Record one lockstep transition for all envs.
        action: (E, A), reward: (E,), next_obs: (E, K*3, H, W)."""
        e = state.ep_ptr
        s = state.step_ptr
        frame = next_obs[:, -3:]
        frames = jax.vmap(
            lambda f, fr: jax.lax.dynamic_update_slice(
                f, fr[None, None], (e, s + 1, 0, 0, 0)),
        )(state.frames, frame)
        actions = jax.vmap(
            lambda a, ai: jax.lax.dynamic_update_slice(
                a, ai[None, None], (e, s, 0)),
        )(state.actions, action.astype(jnp.float32))
        rewards = jax.vmap(
            lambda r, ri: jax.lax.dynamic_update_slice(
                r, ri[None, None], (e, s)),
        )(state.rewards, reward.astype(jnp.float32))
        done_ep = s + 1 >= self.T
        if self.policy == "reservoir":
            # once full, overwrite a uniform-random slot (deterministic:
            # seeded by the completed-episode counter, no rng threading)
            filled = state.num_eps + 1 >= self.num_episodes
            k = jax.random.fold_in(jax.random.PRNGKey(0x5E5B),
                                   state.ep_counter)
            rand_slot = jax.random.randint(k, (), 0, self.num_episodes)
            next_slot = jnp.where(filled, rand_slot,
                                  (e + 1) % self.num_episodes)
        else:
            next_slot = (e + 1) % self.num_episodes
        # stamp the completing slot with its episode ordinal (ep_counter+1 =
        # 1-based completion ordinal; age in episodes = ep_counter − slot_ep)
        stamped = jax.lax.dynamic_update_slice(
            state.slot_ep,
            jnp.full((self.num_envs, 1), state.ep_counter + 1, jnp.int32),
            (0, e))
        return state.replace(
            frames=frames, actions=actions, rewards=rewards,
            slot_ep=jnp.where(done_ep, stamped, state.slot_ep),
            step_ptr=jnp.where(done_ep, 0, s + 1),
            ep_ptr=jnp.where(done_ep, next_slot, e),
            num_eps=jnp.where(
                done_ep, jnp.minimum(state.num_eps + 1, self.num_episodes),
                state.num_eps),
            ep_counter=jnp.where(done_ep, state.ep_counter + 1,
                                 state.ep_counter),
        )

    # -- sampling ------------------------------------------------------------
    def _stack(self, state: ReplayState, env_i, ep_i, s):
        """Frame stack ending at step s: frames[s-K+1 .. s], clamped ≥ 0."""
        K = self.frame_stack
        idxs = jnp.stack([jnp.maximum(s - (K - 1 - k), 0) for k in range(K)])
        fr = state.frames[env_i, ep_i, idxs]           # (K, 3, H, W)
        return fr.reshape(K * 3, *fr.shape[2:])

    def sample_idx(self, state: ReplayState, rng, batch_size: int):
        """Uniform (env, episode, step) over completed episodes."""
        ke, kp, ks = jax.random.split(rng, 3)
        env_i = jax.random.randint(ke, (batch_size,), 0, self.num_envs)
        # when the ring is full, the slot at ep_ptr is being overwritten, so
        # only num_episodes-1 slots hold intact completed episodes: draw
        # r ∈ [0, num_eps - full) and remap past the write head so ep_ptr
        # itself is never sampled (no write-head straddle)
        full = state.num_eps >= self.num_episodes
        n = jnp.maximum(state.num_eps - full.astype(jnp.int32), 1)
        r = jax.random.randint(kp, (batch_size,), 0, n)
        ep_i = jnp.where(
            full,
            (state.ep_ptr + 1 + r) % self.num_episodes,
            r,
        )
        # before ANY episode has completed, the only data is the written
        # prefix of the in-progress slot (ep_i = r = 0 = ep_ptr): restrict
        # the step draw to [0, step_ptr) so unwritten zero frames/actions
        # are never sampled (the reference samples mid-episode transitions
        # the same way, utils.py ring of transitions). Everywhere else the
        # in-progress slot is excluded outright (above), so steps span the
        # full episode.
        s_hi = jnp.where(state.num_eps == 0,
                         jnp.maximum(state.step_ptr, 1), self.T)
        s = jax.random.randint(ks, (batch_size,), 0, s_hi)
        return env_i, ep_i, s

    def sample_raw(self, state: ReplayState, rng,
                   batch_size: int = 0) -> Batch:
        """Raw uint8 batch (no augmentation)."""
        b = batch_size or self.batch_size
        env_i, ep_i, s = self.sample_idx(state, rng, b)
        obs = jax.vmap(self._stack, in_axes=(None, 0, 0, 0))(
            state, env_i, ep_i, s)
        next_obs = jax.vmap(self._stack, in_axes=(None, 0, 0, 0))(
            state, env_i, ep_i, s + 1)
        action = state.actions[env_i, ep_i, s]
        reward = state.rewards[env_i, ep_i, s][:, None]
        not_done = jnp.ones((b, 1), jnp.float32)
        return Batch(obs=obs, action=action, reward=reward,
                     next_obs=next_obs, not_done=not_done,
                     idx=jnp.stack([env_i, ep_i, s], axis=1))

    def sample_obs_only(self, state: ReplayState, rng, batch_size: int):
        """SODA's obs-only sampler (reference: utils.py sample_soda)."""
        env_i, ep_i, s = self.sample_idx(state, rng, batch_size)
        return jax.vmap(self._stack, in_axes=(None, 0, 0, 0))(
            state, env_i, ep_i, s)

    def size(self, state: ReplayState) -> jnp.ndarray:
        return state.num_eps * self.T * self.num_envs
