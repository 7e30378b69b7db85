"""Reacher domain: easy / hard.

Two-link planar arm under a top-down camera, contact disabled (reference:
src/env/dm_control/dm_control/suite/reacher.xml; task math
suite/reacher.py:75-120). The per-episode target position lives in
`task_aux` (the reference mutates `model.geom_pos['target']`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics
from sgqn_carla_tpu.physics.model import (
    CAPSULE, CYLINDER, HINGE, PLANE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import PhysState, Task

_DEFAULT_TIME_LIMIT = 20.0
_BIG_TARGET = 0.05
_SMALL_TARGET = 0.015
_FINGER_SIZE = 0.01
_D = np.deg2rad


def make_model(target_size):
    b = ModelBuilder(timestep=0.02, integrator="euler")
    b.add_geom(0, PLANE, size=(0.3, 0.3, 10), material="grid", name="ground",
               contype=0, conaffinity=0)
    b.add_geom(0, CYLINDER, size=(0.011, 0.01), pos=(0, 0, 0.01),
               material="decoration", name="root", contype=0, conaffinity=0)

    arm = b.add_body(0, pos=(0, 0, 0.01), name="arm")
    b.add_joint(arm, HINGE, axis=(0, 0, 1), damping=0.01, name="shoulder")
    b.add_geom(arm, CAPSULE, size=(0.01,), fromto=(0, 0, 0, 0.12, 0, 0),
               material="self", name="arm", contype=0, conaffinity=0)
    hand = b.add_body(arm, pos=(0.12, 0, 0), name="hand")
    b.add_joint(hand, HINGE, axis=(0, 0, 1), damping=0.01, limited=True,
                range=(_D(-160), _D(160)), name="wrist")
    b.add_geom(hand, CAPSULE, size=(0.01,), fromto=(0, 0, 0, 0.1, 0, 0),
               material="self", name="hand", contype=0, conaffinity=0)
    # the jointless finger body's sphere rides on the hand link at its MJCF
    # offset (reference: reacher.xml finger body pos .12 0 0)
    b.add_geom(hand, SPHERE, size=(_FINGER_SIZE,), pos=(0.12, 0, 0),
               material="effector", name="finger", contype=0, conaffinity=0)

    b.add_geom(0, SPHERE, size=(target_size,), pos=(0, 0, 0.01),
               material="target", name="target", contype=0, conaffinity=0)

    b.add_camera("fixed", pos=(0, 0, 0.75), quat=(1, 0, 0, 0))
    b.add_actuator("shoulder", gear=0.05)
    b.add_actuator("wrist", gear=0.05)
    return b.finalize()


def _make(target_size, name):
    model = make_model(target_size)
    target_geom = next(i for i, g in enumerate(model.geoms)
                       if g.name == "target")
    hand_link = model.joint_id("wrist")

    def init_fn(model, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        qpos = jnp.zeros(model.nv, jnp.float32)
        qpos = qpos.at[0].set(
            jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi))
        qpos = qpos.at[1].set(
            jax.random.uniform(k2, (), jnp.float32, _D(-160), _D(160)))
        angle = jax.random.uniform(k3, (), jnp.float32, 0, 2 * jnp.pi)
        radius = jax.random.uniform(k4, (), jnp.float32, 0.05, 0.20)
        target_xy = jnp.stack([radius * jnp.sin(angle),
                               radius * jnp.cos(angle)])
        npair = len(model.contact_pairs)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((npair,), jnp.float32),
                         task_aux={"target_xy": target_xy})

    def _finger_xy(kin):
        p = kin.p[hand_link] + kin.R[hand_link] @ jnp.asarray(
            [0.12, 0.0, 0.0], kin.R.dtype)
        return p[:2]

    def observe_fn(model, state):
        kin = forward_kinematics(model, state.qpos, state.qvel)
        to_target = state.task_aux["target_xy"] - _finger_xy(kin)
        return {"position": state.qpos[:2], "to_target": to_target,
                "velocity": state.qvel[:2]}

    def reward_fn(model, state, kin, ctrl):
        dist = jnp.linalg.norm(state.task_aux["target_xy"] - _finger_xy(kin))
        return rewards.tolerance(dist, (0, target_size + _FINGER_SIZE))

    def render_overrides(model, phys_state):
        xy = phys_state.task_aux["target_xy"]
        return {target_geom: jnp.stack([xy[0], xy[1], jnp.float32(0.01)])}

    return Task(name=name, model=model, n_sub_steps=1,
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
                render_overrides_fn=render_overrides)


@register("reacher", "easy")
def easy():
    return _make(_BIG_TARGET, "reacher_easy")


@register("reacher", "hard")
def hard():
    return _make(_SMALL_TARGET, "reacher_hard")
