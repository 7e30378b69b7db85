"""Ball-in-cup domain: catch.

Geometry/tendon follow the published dm_control description (reference:
src/env/dm_control/dm_control/suite/ball_in_cup.xml — actuated cup on two
damped/sprung slides, free ball on two slides, limited string tendon range
0–0.3) and task semantics suite/ball_in_cup.py:55-100 (random ball spawn,
sparse in-target reward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics
from sgqn_carla_tpu.physics.model import CAPSULE, PLANE, SLIDE, SPHERE, ModelBuilder
from sgqn_carla_tpu.physics.task import PhysState, Task

_DEFAULT_TIME_LIMIT = 20.0
_CONTROL_TIMESTEP = 0.02

_CUP_PARTS = [
    (-0.05, 0, 0, -0.05, 0, -0.075),
    (-0.05, 0, -0.075, -0.025, 0, -0.1),
    (-0.025, 0, -0.1, 0.025, 0, -0.1),
    (0.025, 0, -0.1, 0.05, 0, -0.075),
    (0.05, 0, -0.075, 0.05, 0, 0),
]
_TARGET_LOCAL = np.array([0.0, 0.0, -0.05])   # site in cup frame
_TARGET_SIZE = np.array([0.05, 0.05])         # x/z half sizes
_BALL_SIZE = 0.025


def make_model():
    b = ModelBuilder(timestep=0.002, integrator="euler")  # MuJoCo default dt
    b.add_geom(0, PLANE, size=(0.6, 0.2, 10), material="grid", name="ground")

    cup = b.add_body(0, pos=(0, 0, 0.6), name="cup")
    b.add_joint(cup, SLIDE, axis=(1, 0, 0), damping=3.0, stiffness=20.0,
                name="cup_x")
    b.add_joint(cup, SLIDE, axis=(0, 0, 1), damping=3.0, stiffness=20.0,
                name="cup_z")
    for i, ft in enumerate(_CUP_PARTS):
        b.add_geom(cup, CAPSULE, size=(0.008,), fromto=ft, material="self",
                   name=f"cup_part_{i}")

    ball = b.add_body(0, pos=(0, 0, 0.2), name="ball")
    b.add_joint(ball, SLIDE, axis=(1, 0, 0), name="ball_x")
    b.add_joint(ball, SLIDE, axis=(0, 0, 1), name="ball_z")
    b.add_geom(ball, SPHERE, size=(_BALL_SIZE,), material="effector",
               name="ball")

    # string: ball site ↔ cup site (0,0,-.108), limited to 0.3 m
    b.add_tendon(ball, (0, 0, 0), cup, (0, 0, -0.108), range=(0.0, 0.3),
                 stiffness=4000.0, damping=20.0)

    b.add_camera("cam0", pos=(0, -1, 0.8), xyaxes=(1, 0, 0, 0, 1, 2))
    b.add_camera("cam1", pos=(0, -1, 0.4), xyaxes=(1, 0, 0, 0, 0, 1))
    b.add_actuator("cup_x", gear=5.0)
    b.add_actuator("cup_z", gear=5.0)
    return b.finalize()


_CUP_LINK = 1   # cup_x=0, cup_z=1
_BALL_LINK = 3  # ball_x=2, ball_z=3


def _init(model, rng):
    kx, kz = jax.random.split(rng)
    qpos = jnp.zeros(model.nv, jnp.float32)
    qpos = qpos.at[2].set(jax.random.uniform(kx, (), jnp.float32, -0.2, 0.2))
    qpos = qpos.at[3].set(jax.random.uniform(kz, (), jnp.float32, 0.2, 0.5))
    npair = len(model.contact_pairs)
    return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                     jnp.zeros((npair,), jnp.float32))


def _observe(model, state: PhysState):
    return {"position": state.qpos, "velocity": state.qvel}


def _reward(model, state: PhysState, kin, ctrl):
    """Sparse: 1 iff the ball is inside the target box (component-wise,
    reference: ball_in_cup.py:40-52)."""
    target = kin.p[_CUP_LINK] + kin.R[_CUP_LINK] @ jnp.asarray(
        _TARGET_LOCAL, kin.R.dtype)
    ball = kin.p[_BALL_LINK]
    d = jnp.abs(jnp.stack([target[0] - ball[0], target[2] - ball[2]]))
    inside = jnp.all(d < jnp.asarray(_TARGET_SIZE) - _BALL_SIZE)
    return inside.astype(jnp.float32)


@register("ball_in_cup", "catch")
def catch():
    model = make_model()
    return Task(
        name="ball_in_cup_catch", model=model,
        n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
        init_fn=_init, observe_fn=_observe, reward_fn=_reward,
        camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
    )
