"""Host-spill replay: full reference capacity in host RAM behind the
on-device working set (``--replay_spill host``).

The reference keeps its whole 600k-transition ring in host RAM and pays an
H2D copy per sampled batch (reference: src/train.py:148-153 capacity
default, src/utils.py:94-135 host-side ring). The TPU-native buffer
(`data/replay.py`) instead lives in HBM so sample→augment→update fuses into
one program — but HBM bounds it to ~200k transitions at 16 envs
(docs/PERF.md HBM table), a 3-6× smaller recency window than the reference
default at num_envs=1.

This module restores the reference window without touching the hot path:

  * the DEVICE ring stays exactly as-is (a working set, sized by
    ``--replay_device_capacity``) — sampling inside the fused chunk is
    unchanged, zero per-step host traffic;
  * a HOST ring (numpy, uint8 frames) holds the FULL ``--replay_capacity``;
  * at each fused-chunk boundary (one episode, already a host sync point)
    the just-completed episode is copied D2H into the host ring, and a few
    uniformly random host episodes are uploaded H2D over random device
    slots ("refresh").

Sampling statistics: the device set is a rolling uniform subsample of the
host ring (each refresh draws uniformly over the host window), so the
two-stage draw — uniform slot refresh, then the buffer's uniform in-chunk
sampling — approximates uniform sampling over the full host window with a
per-chunk working-set correlation. The host window itself is FIFO at the
reference capacity, so the *recency horizon* matches the reference exactly.

Bandwidth: one episode D2H + `refresh` episodes H2D per chunk. A walker
episode is (T+1)·3·84·84 ≈ 5.3 MB/env. MEASURED (round 4, quiet chip,
num_envs=1): refresh=8 moves ~45 MB/chunk and costs +0.88 s (+40%)
through the axon TUNNEL (~50 MB/s effective H2D) — the tunnel, not
PCIe, is the bound; on a standard TPU host (~16 GB/s) the same exchange
is <1%. Default refresh=2 (--replay_spill_refresh) sizes the exchange
for the tunnel; raise it on real hosts for faster working-set mixing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.data.replay import ReplayBuffer, ReplayState


class HostSpill:
    """Host-RAM episode ring + chunk-boundary exchange with the device ring.

    All methods run on the host between fused chunks; nothing here appears
    inside any jitted program.
    """

    def __init__(self, buffer: ReplayBuffer, capacity: int,
                 refresh: int = 2, seed: int = 0):
        self.buffer = buffer
        E, T, s = buffer.num_envs, buffer.T, buffer.image_size
        self.num_host_episodes = max(
            capacity // max(E, 1) // max(T, 1), buffer.num_episodes)
        self.refresh = refresh
        self.rng = np.random.RandomState(seed ^ 0x5B11)
        N = self.num_host_episodes
        self.frames = np.zeros((E, N, T + 1, 3, s, s), np.uint8)
        self.actions = np.zeros((E, N, T, buffer.action_size), np.float32)
        self.rewards = np.zeros((E, N, T), np.float32)
        self.n = 0  # completed host episodes (lockstep across envs)

    # ---- jitted device-side helpers (tiny programs, compiled once) --------
    @functools.cached_property
    def _extract(self):
        @jax.jit
        def f(rstate: ReplayState, slot):
            return (rstate.frames[:, slot], rstate.actions[:, slot],
                    rstate.rewards[:, slot])
        return f

    @functools.cached_property
    def _inject(self):
        @jax.jit
        def f(rstate: ReplayState, slots, fr, ac, rw):
            return rstate.replace(
                frames=rstate.frames.at[:, slots].set(fr),
                actions=rstate.actions.at[:, slots].set(ac),
                rewards=rstate.rewards.at[:, slots].set(rw),
                # refreshed slots carry host-window episodes of unknown
                # original age: stamp them "device-resident since now" so
                # burst forensics never reports a bogus ancient age
                slot_ep=rstate.slot_ep.at[:, slots].set(rstate.ep_counter))
        return f

    # ---- chunk-boundary exchange -------------------------------------------
    def after_chunk(self, rstate: ReplayState, completed_slot: int
                    ) -> ReplayState:
        """Spill the episode that just completed in device slot
        `completed_slot`, then refresh random device slots from the host
        ring. Returns the (possibly) updated device state."""
        # 1. D2H: append the completed episode to the host FIFO ring
        fr, ac, rw = self._extract(rstate, jnp.int32(completed_slot))
        idx = self.n % self.num_host_episodes
        self.frames[:, idx] = np.asarray(fr)
        self.actions[:, idx] = np.asarray(ac)
        self.rewards[:, idx] = np.asarray(rw)
        self.n += 1

        # 2. H2D refresh — only once the host window exceeds what the
        # device ring still holds (before that the device set IS the full
        # history and a refresh would be pure overhead)
        n_dev = self.buffer.num_episodes
        if self.n <= n_dev or self.refresh <= 0:
            return rstate
        avail = min(self.n, self.num_host_episodes)
        host_eps = self.rng.randint(0, avail, size=self.refresh)
        # device targets: completed slots only, never the in-progress one
        ep_ptr = int(jax.device_get(rstate.ep_ptr))
        choices = np.setdiff1d(np.arange(n_dev), [ep_ptr])
        dev_slots = self.rng.choice(choices, size=min(self.refresh,
                                                      len(choices)),
                                    replace=False)
        host_eps = host_eps[: len(dev_slots)]
        return self._inject(
            rstate, jnp.asarray(dev_slots, jnp.int32),
            jnp.asarray(self.frames[:, host_eps]),
            jnp.asarray(self.actions[:, host_eps]),
            jnp.asarray(self.rewards[:, host_eps]))

    def reset(self):
        """Drop the host window (collapse-guard rollback: the ring has
        absorbed collapse-era data — same rationale as the device rebuild,
        docs/PERF.md)."""
        self.n = 0

    @property
    def host_steps(self) -> int:
        return min(self.n, self.num_host_episodes) * self.buffer.T \
            * self.buffer.num_envs
