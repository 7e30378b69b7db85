"""Planar Walker domain: stand / walk / run.

Geometry, joint ranges, gears and task math follow the published dm_control
walker description (reference: src/env/dm_control/dm_control/suite/walker.xml
and suite/walker.py:85-158). The root is three joints on the torso —
rootz (slide z), rootx (slide x), rooty (hinge y) — which the model builder
expands into a 3-link chain; hips/knees/ankles are limited hinges with
damping 0.1 and armature 0.01, actuated with gears 100/50/20.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics, subtree_linvel
from sgqn_carla_tpu.physics.model import CAPSULE, HINGE, PLANE, SLIDE, ModelBuilder
from sgqn_carla_tpu.physics.task import (
    PhysState, Task, randomize_limited_and_rotational_joints,
)

_DEFAULT_TIME_LIMIT = 25.0
_CONTROL_TIMESTEP = 0.025
_STAND_HEIGHT = 1.2
_WALK_SPEED = 1.0
_RUN_SPEED = 8.0

_D = np.deg2rad


def make_model():
    b = ModelBuilder(timestep=0.0025, integrator="euler")
    b.add_geom(0, PLANE, size=(250, 0.8, 0.2), pos=(248, 0, 0), material="grid",
               contype=1, conaffinity=1, friction=0.7, name="floor")

    torso = b.add_body(0, pos=(0, 0, 1.3), name="torso")
    b.add_joint(torso, SLIDE, axis=(0, 0, 1), name="rootz")
    b.add_joint(torso, SLIDE, axis=(1, 0, 0), name="rootx")
    b.add_joint(torso, HINGE, axis=(0, 1, 0), name="rooty")
    b.add_geom(torso, CAPSULE, size=(0.07, 0.3), material="self", name="torso",
               contype=1, conaffinity=0, friction=0.7)

    def leg(side, ysign):
        thigh = b.add_body(torso, pos=(0, ysign * -0.05, -0.3),
                           name=f"{side}_thigh")
        b.add_joint(thigh, HINGE, axis=(0, -1, 0), limited=True,
                    range=(_D(-20), _D(100)), damping=0.1, armature=0.01,
                    name=f"{side}_hip")
        b.add_geom(thigh, CAPSULE, size=(0.05, 0.225), pos=(0, 0, -0.225),
                   material="self", name=f"{side}_thigh", friction=0.7,
                   contype=1, conaffinity=0)
        leg_ = b.add_body(thigh, pos=(0, 0, -0.7), name=f"{side}_leg")
        b.add_joint(leg_, HINGE, axis=(0, -1, 0), pos=(0, 0, 0.25), limited=True,
                    range=(_D(-150), _D(0)), damping=0.1, armature=0.01,
                    name=f"{side}_knee")
        b.add_geom(leg_, CAPSULE, size=(0.04, 0.25), material="self",
                   name=f"{side}_leg", friction=0.7, contype=1,
                   conaffinity=0)
        foot = b.add_body(leg_, pos=(0.06, 0, -0.25), name=f"{side}_foot")
        b.add_joint(foot, HINGE, axis=(0, -1, 0), pos=(-0.06, 0, 0), limited=True,
                    range=(_D(-45), _D(45)), damping=0.1, armature=0.01,
                    name=f"{side}_ankle")
        b.add_geom(foot, CAPSULE, size=(0.05, 0.1), zaxis=(1, 0, 0),
                   material="self", name=f"{side}_foot", friction=0.7,
                   contype=1, conaffinity=0)

    leg("right", +1)
    leg("left", -1)

    # "side" camera: pos (0,-2,.7), euler 60° about x, trackcom
    # (reference: suite/walker.xml:25)
    b.add_camera("side", pos=(0, -2, 0.7), euler_deg=(60, 0, 0), mode="trackcom",
                 fovy=45.0, body=torso)
    b.add_camera("back", pos=(-2, 0, 0.5), xyaxes=(0, -1, 0, 1, 0, 3),
                 mode="trackcom", fovy=45.0, body=torso)
    for side in ("right", "left"):
        b.add_actuator(f"{side}_hip", gear=100.0)
        b.add_actuator(f"{side}_knee", gear=50.0)
        b.add_actuator(f"{side}_ankle", gear=20.0)
    return b.finalize()


# dof indices after expansion: 0=rootz 1=rootx 2=rooty 3=r_hip 4=r_knee
# 5=r_ankle 6=l_hip 7=l_knee 8=l_ankle; torso link = 2 (last root chain link)
_TORSO_LINK = 2


def _init(model, rng):
    qpos = randomize_limited_and_rotational_joints(model, rng)
    qvel = jnp.zeros(model.nv, jnp.float32)
    npair = len(model.contact_pairs)
    return PhysState(qpos, qvel, jnp.zeros((npair,), jnp.float32))


def _observe(model, state: PhysState):
    kin = forward_kinematics(model, state.qpos, state.qvel)
    # orientations: per real body, world xmat [xx, xz] (suite/walker.py:100-102)
    body_links = [2, 3, 4, 5, 6, 7, 8]  # torso + 6 leg links
    orients = jnp.stack(
        [jnp.stack([kin.R[l][0, 0], kin.R[l][0, 2]]) for l in body_links]
    ).reshape(-1)
    height = kin.p[_TORSO_LINK][2]
    return {"orientations": orients, "height": height, "velocity": state.qvel}


def _reward(move_speed: float):
    def reward_fn(model, state: PhysState, kin, ctrl):
        torso_height = kin.p[_TORSO_LINK][2]
        torso_upright = kin.R[_TORSO_LINK][2, 2]
        standing = rewards.tolerance(
            torso_height, bounds=(_STAND_HEIGHT, float("inf")),
            margin=_STAND_HEIGHT / 2)
        upright = (1 + torso_upright) / 2
        stand_reward = (3 * standing + upright) / 4
        if move_speed == 0:
            return stand_reward
        horizontal_velocity = subtree_linvel(model, kin, _TORSO_LINK)[0]
        move_reward = rewards.tolerance(
            horizontal_velocity, bounds=(move_speed, float("inf")),
            margin=move_speed / 2, value_at_margin=0.5, sigmoid="linear")
        return stand_reward * (5 * move_reward + 1) / 6
    return reward_fn


def _make(move_speed, name):
    model = make_model()
    return Task(
        name=name,
        model=model,
        n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
        init_fn=_init,
        observe_fn=_observe,
        reward_fn=_reward(move_speed),
        camera_id=0,
        time_limit=_DEFAULT_TIME_LIMIT,
    )


@register("walker", "stand")
def stand():
    return _make(0.0, "walker_stand")


@register("walker", "walk")
def walk():
    return _make(_WALK_SPEED, "walker_walk")


@register("walker", "run")
def run():
    return _make(_RUN_SPEED, "walker_run")
