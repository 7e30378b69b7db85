"""Fish domain: upright / swim.

3D free-swimming fish in a dense medium, gravity and contact disabled
(reference: src/env/dm_control/dm_control/suite/fish.xml `<option
timestep="0.004" density="5000">` + flags; task math suite/fish.py:75-176).
The torso carries a free root (builder `add_free_root`: 3 slides + 3
intrinsic-xyz hinges — see model.py for the documented divergence from the
quaternion free joint); tail and fins are the reference's hinge pairs.
Actuation is the reference's position-servo set, including the fins_flap
fixed-tendon servo and the passive fins_sym coupling spring
(fish.xml tendon/actuator blocks → engine's generalized transmission).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics
from sgqn_carla_tpu.physics.math3d import quat_to_euler_xyz
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, ELLIPSOID, HINGE, PLANE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import PhysState, Task

_DEFAULT_TIME_LIMIT = 40.0
_CONTROL_TIMESTEP = 0.04  # reference: fish.py:36
_D = np.deg2rad

_TORSO_LINK = 5  # free root = 6 chain links; torso body is the last
# joint order after the root: tail1, tail_twist, tail2, finright_roll,
# finright_pitch, finleft_roll, finleft_pitch (fish.py:38-44 _JOINTS)
_JOINT_DOFS = list(range(6, 13))


def make_model():
    b = ModelBuilder(timestep=0.004, integrator="euler", density=5000.0,
                     gravity=(0, 0, 0))
    b.add_geom(0, PLANE, size=(0.5, 0.5, 0.1), material="grid", name="ground",
               contype=0, conaffinity=0)
    b.add_geom(0, SPHERE, size=(0.04,), pos=(0, 0.4, 0.1), material="target",
               name="target", contype=0, conaffinity=0)

    torso = b.add_body(0, pos=(0, 0, 0.1), name="torso")
    b.add_free_root(torso)
    b.add_geom(torso, ELLIPSOID, size=(0.008, 0.012, 0.008),
               pos=(0, 0.055, 0.015), euler_deg=(-10, 0, 0), material="eye",
               name="eye", mass=0, contype=0, conaffinity=0)
    b.add_geom(torso, CAPSULE, size=(0.005,),
               fromto=(0, 0.079, 0, 0, 0.07, 0), material="effector",
               name="mouth", mass=0, contype=0, conaffinity=0)
    b.add_geom(torso, CAPSULE, size=(0.0045,),
               fromto=(0, 0.079, -0.004, 0, 0.07, -0.003),
               material="effector", name="lower_mouth", mass=0, contype=0,
               conaffinity=0)
    b.add_geom(torso, ELLIPSOID, size=(0.01, 0.08, 0.04), material="self",
               name="torso", mass=0, contype=0, conaffinity=0)
    b.add_geom(torso, ELLIPSOID, size=(0.001, 0.03, 0.015),
               pos=(0, -0.03, 0.03), material="effector", name="back_fin",
               mass=0, contype=0, conaffinity=0)
    b.add_geom(torso, BOX, size=(0.002, 0.06, 0.03), name="torso_massive",
               group=4, contype=0, conaffinity=0)

    tail1 = b.add_body(torso, pos=(0, -0.09, 0), name="tail1")
    b.add_joint(tail1, HINGE, axis=(0, 0, 1), pos=(0, 0.01, 0),
                damping=2e-5, name="tail1")
    # tail_twist declares range ±30° in the XML, but fish.xml:10 disables the
    # whole constraint solver (<flag constraint="disable"/>) so no limit
    # force ever applies — keep the joint unlimited for parity
    b.add_joint(tail1, HINGE, axis=(0, 1, 0), pos=(0, 0.01, 0),
                damping=2e-5, name="tail_twist")
    b.add_geom(tail1, ELLIPSOID, size=(0.001, 0.008, 0.016), material="self",
               name="tail1", contype=0, conaffinity=0)
    tail2 = b.add_body(tail1, pos=(0, -0.028, 0), name="tail2")
    b.add_joint(tail2, HINGE, axis=(0, 0, 1), pos=(0, 0.02, 0),
                damping=2e-5, stiffness=8e-5, name="tail2")
    b.add_geom(tail2, ELLIPSOID, size=(0.001, 0.018, 0.035), material="self",
               name="tail2", contype=0, conaffinity=0)

    for side, sx in (("right", +1), ("left", -1)):
        fin = b.add_body(torso, pos=(sx * 0.01, 0, 0), name=f"fin{side}")
        b.add_joint(fin, HINGE, axis=(0, 1, 0), damping=2e-5,
                    name=f"fin{side}_roll")
        b.add_joint(fin, HINGE, axis=(1, 0, 0), pos=(0, 0.005, 0),
                    damping=2e-5, name=f"fin{side}_pitch")
        b.add_geom(fin, ELLIPSOID, size=(0.02, 0.015, 0.001),
                   pos=(sx * 0.015, 0, 0), material="self",
                   name=f"fin{side}", contype=0, conaffinity=0)

    # position servos (fish.xml actuator block)
    b.add_position_actuator([("tail1", 1.0)], kp=5e-4)
    b.add_position_actuator([("tail_twist", 1.0)], kp=1e-4)
    b.add_position_actuator([("finleft_roll", -0.5), ("finright_roll", 0.5)],
                            kp=3e-4)
    b.add_position_actuator([("finleft_pitch", 1.0)], kp=1e-4)
    b.add_position_actuator([("finright_pitch", 1.0)], kp=1e-4)
    # passive symmetric-fin spring (fish.xml tendon fins_sym)
    b.add_fixed_tendon_spring([("finleft_roll", 0.5), ("finright_roll", 0.5)],
                              stiffness=1e-4)

    b.add_camera("tracking_top", pos=(0, 0, 1), xyaxes=(1, 0, 0, 0, 1, 0),
                 mode="trackcom", fovy=45.0, body=torso)
    b.add_camera("tracking_x", pos=(-0.3, 0, 0.2),
                 xyaxes=(0, -1, 0, 0.342, 0, 0.940), mode="trackcom",
                 fovy=60.0, body=torso)
    # joint-limit gains are inertia-scaled per dof (engine.constraint_scales)
    return b.finalize()


def _random_quat(rng):
    q = jax.random.normal(rng, (4,), jnp.float32)
    return q / jnp.linalg.norm(q)


def _mouth_pose(kin):
    """World position + orientation of the mouth geom (center of its
    fromto segment; frame z along the segment — fish.py:169-173 uses
    geom_xpos/geom_xmat['mouth'])."""
    Rt = kin.R[_TORSO_LINK]
    center = kin.p[_TORSO_LINK] + Rt @ jnp.asarray(
        [0, 0.0745, -0.0], Rt.dtype)
    # mouth frame: z along from→to = (0,−1,0) local; x stays body x
    Rl = jnp.asarray([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]], Rt.dtype)
    return center, Rt @ Rl


def _common(model, state):
    kin = forward_kinematics(model, state.qpos, state.qvel)
    upright = kin.R[_TORSO_LINK][2, 2]
    joints = state.qpos[jnp.asarray(_JOINT_DOFS)]
    return kin, upright, joints


def _make_upright():
    model = make_model()

    def init_fn(model, rng):
        k_q, k_j = jax.random.split(rng)
        qpos = jnp.zeros(model.nv, jnp.float32)
        qpos = qpos.at[3:6].set(quat_to_euler_xyz(_random_quat(k_q)))
        qpos = qpos.at[jnp.asarray(_JOINT_DOFS)].set(
            jax.random.uniform(k_j, (len(_JOINT_DOFS),), jnp.float32,
                               -0.2, 0.2))
        npair = len(model.contact_pairs)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((npair,), jnp.float32))

    def observe_fn(model, state):
        kin, upright, joints = _common(model, state)
        return {"joint_angles": joints, "upright": upright,
                "velocity": state.qvel}

    def reward_fn(model, state, kin, ctrl):
        return rewards.tolerance(kin.R[_TORSO_LINK][2, 2], bounds=(1, 1),
                                 margin=1.0)

    return Task(name="fish_upright", model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT)


def _make_swim():
    model = make_model()
    target_geom = next(i for i, g in enumerate(model.geoms)
                       if g.name == "target")
    radii = 0.005 + 0.04  # mouth + target geom radii (fish.py:184)

    def init_fn(model, rng):
        k_j, k_t, k_z = jax.random.split(rng, 3)
        qpos = jnp.zeros(model.nv, jnp.float32)
        qpos = qpos.at[jnp.asarray(_JOINT_DOFS)].set(
            jax.random.uniform(k_j, (len(_JOINT_DOFS),), jnp.float32,
                               -0.2, 0.2))
        xy = jax.random.uniform(k_t, (2,), jnp.float32, -0.4, 0.4)
        z = jax.random.uniform(k_z, (), jnp.float32, 0.1, 0.3)
        target = jnp.concatenate([xy, z[None]])
        npair = len(model.contact_pairs)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((npair,), jnp.float32),
                         task_aux={"target": target})

    def _mouth_to_target(state, kin):
        center, Rm = _mouth_pose(kin)
        return Rm.T @ (state.task_aux["target"] - center)

    def observe_fn(model, state):
        kin, upright, joints = _common(model, state)
        return {"joint_angles": joints, "upright": upright,
                "target": _mouth_to_target(state, kin),
                "velocity": state.qvel}

    def reward_fn(model, state, kin, ctrl):
        dist = jnp.linalg.norm(_mouth_to_target(state, kin))
        in_target = rewards.tolerance(dist, bounds=(0, radii),
                                      margin=2 * radii)
        is_upright = 0.5 * (kin.R[_TORSO_LINK][2, 2] + 1)
        return (7 * in_target + is_upright) / 8

    def render_overrides(model, phys_state):
        return {target_geom: phys_state.task_aux["target"]}

    return Task(name="fish_swim", model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
                render_overrides_fn=render_overrides)


@register("fish", "upright")
def upright():
    return _make_upright()


@register("fish", "swim")
def swim():
    return _make_swim()
