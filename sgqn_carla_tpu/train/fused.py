"""Fused training chunk: [act → env step → replay add → update] × T in one
jitted program.

The reference alternates host-side calls per env step — sample_action (H2D
obs copy), env.step (C physics + GL render + D2H pixels), buffer.add, then
update (H2D batch) (reference: src/train.py:222-256, SURVEY §3 hot loops).
Here the whole cadence is a `lax.scan` over wrapper steps: acting, stepping
the vectorized env batch, writing replay, and the gradient update all stay
in HBM; the host only sees per-chunk aggregate metrics. One dispatch per
episode instead of ~1000.

The reference's init_steps catch-up (train.py:241-246: `num_updates =
init_steps` once) is preserved by the driver calling `catch_up` at the
boundary; inside the chunk `do_updates` statically selects whether the
update runs (warmup chunks skip it entirely — no wasted compute).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sgqn_carla_tpu.agents.sac import SAC, AgentState
from sgqn_carla_tpu.data.replay import ReplayBuffer, ReplayState
from sgqn_carla_tpu.envs.vector import VectorEnv


class FusedTrainer:
    """Builds jitted chunk programs for (agent, venv, buffer)."""

    def __init__(self, agent: SAC, venv: VectorEnv, buffer: ReplayBuffer,
                 updates_per_step: int = 1):
        self.agent = agent
        self.venv = venv
        self.buffer = buffer
        self.updates_per_step = updates_per_step
        self._chunk_cache = {}

    def _chunk_fn(self, length: int, do_updates: bool):
        agent, venv, buffer = self.agent, self.venv, self.buffer

        def body(carry, _):
            astate, states, rstate, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            actions = agent._sample_action(astate, obs, k_act)
            states, res = venv._step(states, actions)
            rstate = buffer.add(rstate, actions, res.reward, res.obs)
            metrics = {}
            if do_updates:
                for _ in range(self.updates_per_step):
                    astate, metrics = agent._update(astate, rstate, buffer)
            return (astate, states, rstate, res.obs, rng), (
                res.reward, metrics)

        # Donate the whole carry: the replay ring dominates HBM (capacity ×
        # 21.2 kB, docs/PERF.md), and without input→output aliasing every
        # chunk boundary holds TWO rings (the input and the scan's output)
        # — at num_envs=16 that double-ring plus the guard-rollback rewarm
        # program is exactly the RESOURCE_EXHAUSTED that killed the first
        # flag_r3b soak at its first rollback. Callers rebind every carry
        # element (train/loop.py:315) and checkpoint saves copy to host
        # (np.asarray) before the next chunk.
        # env states / obs stay undonated: the wrapper state carries the
        # frame-stack buffer, which can alias the obs array — and the TPU
        # runtime rejects a donation set containing one buffer twice
        @functools.partial(jax.jit, donate_argnums=(0, 2))
        def chunk(astate, states, rstate, obs, rng):
            (astate, states, rstate, obs, rng), (rewards, metrics) = (
                jax.lax.scan(body, (astate, states, rstate, obs, rng), None,
                             length=length))
            mean_metrics = jax.tree_util.tree_map(jnp.mean, metrics)
            return (astate, states, rstate, obs, rng,
                    rewards.sum(0),  # (num_envs,) episode-chunk returns
                    mean_metrics)

        return chunk

    def run_chunk(self, length: int, do_updates: bool, astate, states,
                  rstate, obs, rng):
        key = (length, do_updates, self.updates_per_step)
        if key not in self._chunk_cache:
            # mode switch (rewarm → train after a guard rollback): drop the
            # rewarm executables before compiling the full-scale training
            # chunk — that compile is the one that measured
            # RESOURCE_EXHAUSTED next to a resident sibling (flag_r3b
            # attempt 1). The cheaper rewarm program compiles fine NEXT TO
            # the resident training executable (its carry is donated), so
            # the train → rewarm direction keeps both and the switch back
            # pays no reload (round-3 advisor note).
            evict = [k for k in self._chunk_cache
                     if isinstance(k[0], int) and k[1] != do_updates]
            if do_updates and evict:
                for k in evict:
                    del self._chunk_cache[k]
                import gc
                gc.collect()
            self._chunk_cache[key] = self._chunk_fn(length, do_updates)
        return self._chunk_cache[key](astate, states, rstate, obs, rng)

    def random_chunk(self, length: int, states, rstate, obs, rng):
        """Warmup chunk with uniform random actions (reference:
        train.py:227-231 pre-init_steps acting)."""
        venv, buffer = self.venv, self.buffer
        n = self.venv.num_envs
        a_dim = self.venv.action_size

        def body(carry, _):
            states, rstate, obs, rng = carry
            rng, k = jax.random.split(rng)
            actions = jax.random.uniform(k, (n, a_dim), minval=-1.0,
                                         maxval=1.0)
            states, res = venv._step(states, actions)
            rstate = buffer.add(rstate, actions, res.reward, res.obs)
            return (states, rstate, res.obs, rng), res.reward

        key = ("rand", length)
        if key not in self._chunk_cache:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def chunk(states, rstate, obs, rng):
                (states, rstate, obs, rng), rewards = jax.lax.scan(
                    body, (states, rstate, obs, rng), None, length=length)
                return states, rstate, obs, rng, rewards.sum(0)

            self._chunk_cache[key] = chunk
        return self._chunk_cache[key](states, rstate, obs, rng)

    def catch_up(self, num_updates: int, astate, rstate):
        """The reference's one-time init_steps update burst
        (train.py:241-246), as a single scanned program."""
        agent, buffer = self.agent, self.buffer

        key = ("catchup", num_updates)
        if key not in self._chunk_cache:
            # donate the agent state only — the ring stays live in the caller
            @functools.partial(jax.jit, donate_argnums=(0,))
            def burst(astate, rstate):
                def body(a, _):
                    a, m = agent._update(a, rstate, buffer)
                    return a, m

                astate, ms = jax.lax.scan(body, astate, None,
                                          length=num_updates)
                return astate, jax.tree_util.tree_map(lambda x: x[-1], ms)

            self._chunk_cache[key] = burst
        return self._chunk_cache[key](astate, rstate)
