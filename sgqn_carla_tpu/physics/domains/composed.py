"""Composer demo domain: two reusable Pendulum entities on one arena.

Exercises the composer layer (physics/composer.py — the counterpart of
dm_control's composer/ subpackage, reference composer/entity.py:199,
arena.py:30, task.py:44) end-to-end through the same registry, engine,
property-test, and render paths as the hand-written suite domains. The
scene is deliberately simple so the suite-wide sweep stays cheap; the
point is namespaced multi-instance attachment, per-entity observables,
and per-entity episode randomization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.composer import Arena, ComposerTask, Entity
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.model import CAPSULE, HINGE, SPHERE

_COS_8DEG = float(np.cos(np.deg2rad(8)))


class Pendulum(Entity):
    """A torque-actuated pendulum fragment (geometry after the reference
    suite/pendulum.xml; authored through the entity API so several
    instances can share one arena)."""

    def __init__(self, name: str, length: float = 0.5, gear: float = 1.0):
        super().__init__(name)
        self.length = length
        self.gear = gear

    def _build(self, arena, parent, pos, quat):
        b = self.builder
        pole = b.add_body(parent, pos=pos, quat=quat,
                          name=self.scoped("pole"))
        self.add_joint(pole, HINGE, axis=(0, 1, 0), damping=0.1,
                       name="hinge")
        b.add_geom(pole, CAPSULE, size=(0.02,),
                   fromto=(0, 0, 0, 0, 0, self.length), mass=0.0,
                   material="self", name=self.scoped("pole"),
                   contype=0, conaffinity=0)
        b.add_geom(pole, SPHERE, size=(0.05,), pos=(0, 0, self.length),
                   mass=1.0, material="effector", name=self.scoped("mass"),
                   contype=0, conaffinity=0)
        b.add_actuator(self.scoped("hinge"), gear=self.gear)
        self._pole_link = len(b.bodies) - 1  # body idx before link expansion

    def observables(self):
        def orientation(model, state, kin):
            R = kin.R[model.joint_id(self.scoped("hinge"))]
            return jnp.stack([R[2, 2], R[0, 2]])

        def velocity(model, state, kin):
            return state.qvel[model.joint_id(self.scoped("hinge"))]

        return {"orientation": orientation, "velocity": velocity}

    def initialize_episode(self, model, rng):
        angle = jax.random.uniform(rng, (), jnp.float32, -jnp.pi, jnp.pi)
        return {self.scoped("hinge"): angle}

    def uprightness(self, model, kin):
        """cos(angle) of this instance's pole."""
        return kin.R[model.joint_id(self.scoped("hinge"))][2, 2]


@register("composer_demo", "pendula")
def pendula():
    arena = Arena(size=4.0, timestep=0.02)
    left = Pendulum("left", length=0.5)
    right = Pendulum("right", length=0.35, gear=0.7)
    arena.attach(left, pos=(-0.4, 0, 0.6))
    arena.attach(right, pos=(0.4, 0, 0.6))
    arena.add_camera("fixed", pos=(0, -2.2, 0.8), xyaxes=(1, 0, 0, 0, 0, 1))

    def reward_fn(model, state, kin, ctrl):
        # mean per-entity swing-up tolerance (reference pendulum.py:71-73
        # applied per instance)
        ups = jnp.stack([left.uprightness(model, kin),
                         right.uprightness(model, kin)])
        return jnp.mean(rewards.tolerance(ups, (_COS_8DEG, 1.0)))

    return ComposerTask(name="composer_demo_pendula", arena=arena,
                        reward_fn=reward_fn, n_sub_steps=1,
                        time_limit=20.0).build()
