"""Composer: entity/arena/task composition on top of the builder DSL.

TPU-native counterpart of dm_control's `composer/` subpackage (reference:
src/env/dm_control/dm_control/composer/{entity.py:199 Entity,
arena.py:30 Arena, task.py:44 Task, environment.py:271 Environment}).
The reference composes MJCF XML trees at attach time and relies on the
mutable MjModel; here an `Entity` records builder ops, `Arena.attach`
replays them under a namespaced prefix, and `ComposerTask.build()`
compiles everything into the same immutable pytree `Model` + functional
`Task` the rest of the stack consumes (envs.base, render, scripts/view).

Scope: the subset the suite-style workloads need — reusable model
fragments, namespaced attachment (optionally on a free root), entity
observables, and per-episode initialization hooks. The reference's
observation buffering/delay pipeline (composer/observation/) is host-side
machinery made unnecessary by fused on-device rollouts, and its
variation/ module maps to plain jax.random use inside init hooks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sgqn_carla_tpu.physics.model import PLANE, Model, ModelBuilder
from sgqn_carla_tpu.physics.task import PhysState, Task


class Entity:
    """A reusable model fragment (reference composer/entity.py:199).

    Subclasses implement `_build(arena, root)` using `self.builder`
    (the arena's ModelBuilder) with all joint/actuator names routed
    through `self.scoped(name)` so multiple instances never collide —
    the counterpart of MJCF attachment-frame namespacing
    (reference composer/entity.py:298 `attach`).
    """

    def __init__(self, name: str):
        self.name = name
        self.builder: Optional[ModelBuilder] = None
        self._joint_names: List[str] = []

    # -- namespacing --------------------------------------------------------
    def scoped(self, name: str) -> str:
        return f"{self.name}/{name}"

    def add_joint(self, body: int, *args, name: str, **kw):
        """Joint authoring routed through the entity namespace; records
        the scoped name so `joint_ids` can index qpos/qvel post-compile."""
        scoped = self.scoped(name)
        self.builder.add_joint(body, *args, name=scoped, **kw)
        self._joint_names.append(scoped)

    def add_free_root(self, body: int, **kw):
        prefix = self.scoped(kw.pop("prefix", "root"))
        self.builder.add_free_root(body, prefix=prefix, **kw)
        self._joint_names += [f"{prefix}_{s}"
                              for s in ("x", "y", "z", "rx", "ry", "rz")]

    # -- hooks for subclasses ----------------------------------------------
    def _build(self, arena: "Arena", parent: int, pos, quat) -> None:
        """Author the fragment. The entity's root body must be added with
        `self.builder.add_body(parent, pos=pos, quat=quat, ...)` and must
        carry at least one joint — the engine has no fixed (jointless)
        bodies (physics/model.py:407), so the attachment frame collapses
        into the entity root rather than a separate mount body."""
        raise NotImplementedError

    def observables(self) -> Dict[str, Callable]:
        """name -> (model, PhysState, kin) -> jnp array. Keys are scoped
        by the arena at build time (reference composer/entity.py:262)."""
        return {}

    def initialize_episode(self, model: Model, rng) -> Dict[str, jnp.ndarray]:
        """Optional per-episode randomization: return {scoped joint name:
        qpos value} overrides (reference composer/task.py hooks
        initialize_episode / initialize_episode_mjcf)."""
        return {}

    # -- post-compile helpers ----------------------------------------------
    def joint_ids(self, model: Model) -> List[int]:
        return [model.joint_id(n) for n in self._joint_names]


class Arena(Entity):
    """The attachment root: owns the ModelBuilder, seeds the world floor,
    and replays entity builds under it (reference composer/arena.py:30 —
    an Arena *is* an Entity whose mjcf_model is the attachment root)."""

    def __init__(self, name: str = "arena", size: float = 8.0,
                 timestep: float = 0.0025, **builder_kw):
        super().__init__(name)
        self.builder = ModelBuilder(timestep=timestep, **builder_kw)
        self.builder.add_geom(0, PLANE, size=(size, size, 0.2),
                              material="grid", name=self.scoped("floor"))
        self.entities: List[Tuple[Entity, int]] = []

    def attach(self, entity: Entity, pos=(0, 0, 0), quat=None,
               free: bool = False) -> Entity:
        """Attach an entity at a world-frame pose; `free=True` interposes
        a 6-DoF-rooted mount body (reference entity.py:298 attach + robot
        bases). Without `free`, the pose is passed into the entity's root
        body (see `Entity._build`) because jointless mount bodies are
        unsupported by the engine."""
        entity.builder = self.builder
        if free:
            mount = self.builder.add_body(0, pos=pos, quat=quat,
                                          name=entity.scoped("mount"))
            entity.add_free_root(mount)
            entity._build(self, mount, (0, 0, 0), None)
        else:
            entity._build(self, 0, pos, quat)
        self.entities.append((entity, 0))
        return entity

    def add_camera(self, *args, **kw):
        self.builder.add_camera(*args, **kw)


@dataclass
class ComposerTask:
    """Binds an arena + entities to reward/termination and compiles to the
    stack's functional `Task` (reference composer/task.py:44 +
    environment.py:271; the RL loop itself lives in envs.base, which is
    the control.Environment equivalent).

    reward_fn: (model, PhysState, kin, ctrl) -> scalar, same signature as
    hand-written domains (physics/task.py).
    """

    name: str
    arena: Arena
    reward_fn: Callable
    n_sub_steps: int = 4
    time_limit: float = 25.0
    camera_id: int = 0
    extra_observables: Dict[str, Callable] = field(default_factory=dict)

    def build(self) -> Task:
        model = self.arena.builder.finalize()
        entities = [e for e, _ in self.arena.entities]

        # scoped observable table, frozen at build time
        obs_fns: Dict[str, Callable] = {}
        for ent in entities:
            for key, fn in ent.observables().items():
                obs_fns[f"{ent.name}/{key}"] = fn
        obs_fns.update(self.extra_observables)
        if not obs_fns:
            obs_fns = {
                "qpos": lambda m, s, kin: s.qpos,
                "qvel": lambda m, s, kin: s.qvel,
            }

        # per-entity init overrides keyed by qpos index (static python ints)
        def init_fn(model, rng):
            qpos = jnp.zeros(model.nv, jnp.float32)
            for ent in entities:
                rng, sub = jax.random.split(rng)
                for jname, val in ent.initialize_episode(model, sub).items():
                    qpos = qpos.at[model.joint_id(jname)].set(val)
            return PhysState(
                qpos, jnp.zeros(model.nv, jnp.float32),
                jnp.zeros((len(model.contact_pairs),), jnp.float32))

        def observe_fn(model, state):
            from sgqn_carla_tpu.physics.engine import forward_kinematics
            kin = forward_kinematics(model, state.qpos, state.qvel)
            return {k: jnp.atleast_1d(fn(model, state, kin))
                    for k, fn in sorted(obs_fns.items())}

        return Task(name=self.name, model=model,
                    n_sub_steps=self.n_sub_steps, init_fn=init_fn,
                    observe_fn=observe_fn, reward_fn=self.reward_fn,
                    camera_id=self.camera_id, time_limit=self.time_limit)
