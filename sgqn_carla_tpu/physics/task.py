"""Task protocol: the dm_control (physics, task) pair as pure functions.

A `Task` bundles a compiled `Model` with episode initialization, observation,
and reward functions (reference: dm_control suite task classes, e.g.
PlanarWalker at src/env/dm_control/dm_control/suite/walker.py:105-158, and
control.Environment's step/reset protocol at rl/control.py:35-167).

All functions are pure and vmappable:
  init(rng)                 -> PhysState
  observe(phys_state)       -> flat obs dict (jnp arrays)
  reward(phys_state, ctrl)  -> scalar
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.model import HINGE, SLIDE, Model


class PhysState(struct.PyTreeNode):
    """Dynamic physics state (per env; vmapped leading axis for batches)."""

    qpos: jnp.ndarray
    qvel: jnp.ndarray
    contact_force: jnp.ndarray  # (npair,) latest normal force magnitudes
    task_aux: Any = None        # per-episode task parameters (e.g. target pos)
    # warm-start impulses of the implicit contact solver (grasp domains):
    # (dense.warm_size(model), 3) λ(n, t1, t2), persisted across control
    # steps so static holds keep their converged impulses (None elsewhere)
    solver_warm: Any = None


@dataclass(frozen=False)
class Task:
    """A domain/task pair. Instances are static configuration closed over by
    jitted step functions — never traced."""

    name: str
    model: Model
    n_sub_steps: int
    init_fn: Callable  # (model, rng) -> PhysState
    observe_fn: Callable  # (model, PhysState) -> Dict[str, jnp.ndarray]
    reward_fn: Callable  # (model, PhysState, kin, ctrl) -> jnp scalar
    camera_id: int = 0
    time_limit: float = 25.0
    # optional: per-episode world-geom pose overrides for rendering (e.g.
    # reacher/finger targets whose positions the reference mutates in
    # model.geom_pos / site_pos): (model, PhysState) -> {geom_idx: pos(3,)}
    render_overrides_fn: Optional[Callable] = None
    # optional control-step override: (model, n_sub_steps, PhysState, ctrl)
    # -> PhysState. Used by domains with actuator activation dynamics (e.g.
    # quadruped's dyntype=filter servos, reference quadruped.xml default
    # <general dyntype="filter" dynprm=".1">) that must integrate extra
    # state alongside the physics substeps.
    step_fn: Optional[Callable] = None

    @property
    def action_size(self) -> int:
        return self.model.nu

    def control_timestep(self) -> float:
        return self.model.timestep * self.n_sub_steps

    def max_steps(self) -> int:
        return int(round(self.time_limit / self.control_timestep()))

    def init(self, rng) -> PhysState:
        state = self.init_fn(self.model, rng)
        if self.model.implicit_contacts and len(self.model.contact_pairs):
            from sgqn_carla_tpu.physics import dense

            state = state.replace(solver_warm=jnp.zeros(
                (dense.warm_size(self.model), 3), jnp.float32))
        return state

    def step(self, state: PhysState, ctrl) -> PhysState:
        if self.step_fn is not None:
            return self.step_fn(self.model, self.n_sub_steps, state, ctrl)
        if state.solver_warm is not None:
            out, warm = engine.n_steps_warm(
                self.model, state.qpos, state.qvel, ctrl,
                self.n_sub_steps, state.solver_warm)
            return state.replace(qpos=out.qpos, qvel=out.qvel,
                                 contact_force=out.contact_force,
                                 solver_warm=warm)
        out = engine.n_steps(self.model, state.qpos, state.qvel, ctrl,
                             self.n_sub_steps)
        return state.replace(qpos=out.qpos, qvel=out.qvel,
                             contact_force=out.contact_force)

    def observe(self, state: PhysState) -> Dict[str, jnp.ndarray]:
        return self.observe_fn(self.model, state)

    def reward(self, state: PhysState, ctrl) -> jnp.ndarray:
        kin = engine.forward_kinematics(self.model, state.qpos, state.qvel)
        return self.reward_fn(self.model, state, kin, ctrl)


def randomize_limited_and_rotational_joints(model: Model, rng, base_qpos=None):
    """The dm_control suite initial-state randomizer (reference:
    suite/utils/randomizers.py): limited joints → uniform in range; unlimited
    hinges → uniform angle in (-π, π]; unlimited slides → untouched."""
    qpos = (jnp.zeros(model.nv, jnp.float32) if base_qpos is None
            else jnp.asarray(base_qpos, jnp.float32))
    keys = jax.random.split(rng, model.nv)
    # 6-dof slide+hinge free roots: orientation uniform on SO(3) via a random
    # unit quaternion → Euler chart (matches the reference's free-joint rule,
    # randomizers.py:45-46: "Quaternions for unlimited free joints ... sampled
    # uniformly"); linear dofs untouched (rule :49)
    free_dofs = set()
    for start in model.free_roots:
        from sgqn_carla_tpu.physics.math3d import quat_to_euler_xyz

        free_dofs.update(range(start, start + 6))
        q = jax.random.normal(keys[start], (4,), jnp.float32)
        q = q / jnp.linalg.norm(q)
        qpos = qpos.at[start + 3:start + 6].set(quat_to_euler_xyz(q))
    for i in range(model.nv):
        if i in free_dofs:
            continue
        limited = bool(model.jnt_limited[i])
        jtype = int(model.jnt_type[i])
        lo, hi = float(model.jnt_range[i, 0]), float(model.jnt_range[i, 1])
        if limited:
            qpos = qpos.at[i].set(
                jax.random.uniform(keys[i], (), jnp.float32, lo, hi))
        elif jtype == HINGE:
            qpos = qpos.at[i].set(
                jax.random.uniform(keys[i], (), jnp.float32, -jnp.pi, jnp.pi))
    return qpos
