"""Vectorized environment batch: vmap over `DMCPixelEnv`.

The reference steps ONE env per process (reference: src/train.py:77,
CUDA_VISIBLE_DEVICES=0 per script); here the env batch is the data-parallel
axis (SURVEY §2.4): `vmap`-ped envs live in device memory next to the
learner, and the batch dimension shards over the mesh's ``data`` axis.

DMC episodes have no early termination — every env hits the time limit on
the same step — so episode boundaries are lockstep and the driver calls
`reset` at known steps instead of paying a per-step select-based autoreset.
`step_autoreset` is provided for envs with data-dependent termination
(the CARLA twin).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sgqn_carla_tpu.envs.base import DMCPixelEnv, EnvState, StepResult


class VectorEnv:
    def __init__(self, env: DMCPixelEnv, num_envs: int):
        self.env = env
        self.num_envs = num_envs
        self._reset = jax.jit(jax.vmap(env.reset))
        self._step = jax.vmap(env.step)  # callers jit the composition

    @property
    def obs_shape(self):
        return (self.num_envs,) + self.env.obs_shape

    @property
    def action_size(self):
        return self.env.action_size

    def reset(self, rng) -> Tuple[EnvState, jnp.ndarray]:
        keys = jax.random.split(rng, self.num_envs)
        return self._reset(keys)

    def step(self, states: EnvState, actions) -> Tuple[EnvState, StepResult]:
        return self._step(states, actions)

    def step_autoreset(self, states: EnvState, actions):
        """Step, then re-initialize any env whose episode ended (select-based:
        both branches run under vmap; use only when termination is
        data-dependent)."""
        states2, res = self._step(states, actions)
        keys = jax.vmap(lambda s: jax.random.split(s.rng, 2))(states2)
        reset_states, _ = self._reset(keys[:, 0])
        reset_states = jax.vmap(
            lambda s, k: s.replace(rng=k))(reset_states, keys[:, 1])

        def pick(new, old):
            done = res.done
            bdone = done.reshape(done.shape + (1,) * (new.ndim - 1))
            return jnp.where(bdone, new, old)

        merged = jax.tree_util.tree_map(pick, reset_states, states2)
        return merged, res
