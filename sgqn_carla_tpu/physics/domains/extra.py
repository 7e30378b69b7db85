"""Additional suite domains: pendulum, acrobot, point_mass, hopper.

Specs follow the published dm_control descriptions (reference:
src/env/dm_control/dm_control/suite/{pendulum,acrobot,point_mass,hopper}
.xml/.py). These extend coverage beyond the six DMCGB benchmark domains
toward the full 18-domain registry (suite/__init__.py:28-45); the remaining
domains need a 6-DoF free-joint root (humanoid, fish, quadruped, ...) and
are planned for the engine's free-joint extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics, subtree_linvel
from sgqn_carla_tpu.physics.model import (
    CAPSULE, CYLINDER, HINGE, PLANE, SLIDE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import (
    PhysState, Task, randomize_limited_and_rotational_joints,
)

_D = np.deg2rad


# ------------------------------------------------------------------ pendulum
@register("pendulum", "swingup")
def pendulum_swingup():
    b = ModelBuilder(timestep=0.02, integrator="euler")
    b.add_geom(0, PLANE, size=(2, 2, 0.2), material="grid", name="floor",
               contype=0, conaffinity=0)
    pole = b.add_body(0, pos=(0, 0, 0.6), name="pole")
    b.add_joint(pole, HINGE, axis=(0, 1, 0), damping=0.1, name="hinge")
    b.add_geom(pole, CYLINDER, size=(0.021, 0.03), zaxis=(0, 1, 0), mass=0.0,
               material="decoration", name="base", contype=0, conaffinity=0)
    b.add_geom(pole, CAPSULE, size=(0.02,), fromto=(0, 0, 0, 0, 0, 0.5),
               mass=0.0, material="self", name="pole", contype=0,
               conaffinity=0)
    b.add_geom(pole, SPHERE, size=(0.05,), pos=(0, 0, 0.5), mass=1.0,
               material="effector", name="mass", contype=0, conaffinity=0)
    b.add_camera("fixed", pos=(0, -1.5, 2), xyaxes=(1, 0, 0, 0, 1, 1))
    b.add_actuator("hinge", gear=1.0)
    model = b.finalize()
    cos_bound = float(np.cos(_D(8)))

    def init_fn(model, rng):
        qpos = jax.random.uniform(rng, (1,), jnp.float32, -jnp.pi, jnp.pi)
        return PhysState(qpos, jnp.zeros(1, jnp.float32),
                         jnp.zeros((len(model.contact_pairs),), jnp.float32))

    def observe_fn(model, state):
        kin = forward_kinematics(model, state.qpos, state.qvel)
        R = kin.R[0]
        return {"orientation": jnp.stack([R[2, 2], R[0, 2]]),
                "velocity": state.qvel}

    def reward_fn(model, state, kin, ctrl):
        return rewards.tolerance(kin.R[0][2, 2], (cos_bound, 1.0))

    return Task(name="pendulum_swingup", model=model, n_sub_steps=1,
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=20.0)


# ------------------------------------------------------------------- acrobot
def _acrobot(sparse, name):
    b = ModelBuilder(timestep=0.01, integrator="rk4")
    b.add_geom(0, PLANE, size=(3, 3, 0.2), material="grid", name="floor",
               contype=0, conaffinity=0)
    upper = b.add_body(0, pos=(0, 0, 2), name="upper_arm")
    b.add_joint(upper, HINGE, axis=(0, 1, 0), damping=0.05, name="shoulder")
    b.add_geom(upper, CYLINDER, size=(0.051, 0.06), zaxis=(0, 1, 0), mass=0.0,
               material="decoration", name="shoulder_dec", contype=0,
               conaffinity=0)
    # arm masses are 1 kg each — acrobot.xml's geom default sets mass="1",
    # overriding density-derived mass (reference: suite/acrobot.xml:15-16)
    b.add_geom(upper, CAPSULE, size=(0.05,), fromto=(0, 0, 0, 0, 0, 1),
               material="self", name="upper_arm", contype=0, conaffinity=0,
               mass=1.0)
    lower = b.add_body(upper, pos=(0, 0, 1), name="lower_arm")
    b.add_joint(lower, HINGE, axis=(0, 1, 0), damping=0.05, name="elbow")
    b.add_geom(lower, CAPSULE, size=(0.049,), fromto=(0, 0, 0, 0, 0, 1),
               material="self", name="lower_arm", contype=0, conaffinity=0,
               mass=1.0)
    b.add_camera("fixed", pos=(0, -6, 2), zaxis=(0, -1, 0))
    b.add_actuator("elbow", gear=2.0)
    model = b.finalize()
    target = np.array([0.0, 0.0, 4.0])
    target_radius = 0.2

    def init_fn(model, rng):
        qpos = jax.random.uniform(rng, (2,), jnp.float32, -jnp.pi, jnp.pi)
        return PhysState(qpos, jnp.zeros(2, jnp.float32),
                         jnp.zeros((len(model.contact_pairs),), jnp.float32))

    def observe_fn(model, state):
        kin = forward_kinematics(model, state.qpos, state.qvel)
        return {"orientations": jnp.stack([kin.R[0][0, 2], kin.R[1][0, 2],
                                           kin.R[0][2, 2], kin.R[1][2, 2]]),
                "velocity": state.qvel}

    def reward_fn(model, state, kin, ctrl):
        tip = kin.p[1] + kin.R[1] @ jnp.asarray([0.0, 0.0, 1.0])
        dist = jnp.linalg.norm(jnp.asarray(target, jnp.float32) - tip)
        return rewards.tolerance(dist, bounds=(0, target_radius),
                                 margin=0 if sparse else 1)

    return Task(name=name, model=model, n_sub_steps=1, init_fn=init_fn,
                observe_fn=observe_fn, reward_fn=reward_fn, camera_id=0,
                time_limit=10.0)


@register("acrobot", "swingup")
def acrobot_swingup():
    return _acrobot(False, "acrobot_swingup")


@register("acrobot", "swingup_sparse")
def acrobot_swingup_sparse():
    return _acrobot(True, "acrobot_swingup_sparse")


# ---------------------------------------------------------------- point_mass
def _point_mass(randomize_gains, name):
    b = ModelBuilder(timestep=0.02, integrator="euler")
    b.add_geom(0, PLANE, size=(0.3, 0.3, 0.1), material="grid", name="ground",
               contype=0, conaffinity=0)
    pm = b.add_body(0, pos=(0, 0, 0.01), name="pointmass")
    b.add_joint(pm, SLIDE, axis=(1, 0, 0), limited=True, range=(-0.29, 0.29),
                damping=1.0, name="root_x")
    b.add_joint(pm, SLIDE, axis=(0, 1, 0), limited=True, range=(-0.29, 0.29),
                damping=1.0, name="root_y")
    b.add_geom(pm, SPHERE, size=(0.01,), mass=0.3, material="self",
               name="pointmass", contype=0, conaffinity=0)
    b.add_geom(0, SPHERE, size=(0.015,), pos=(0, 0, 0.01), material="target",
               name="target", contype=0, conaffinity=0)
    b.add_camera("fixed", pos=(0, 0, 0.75), quat=(1, 0, 0, 0))
    b.add_actuator("root_x", gear=0.1)
    b.add_actuator("root_y", gear=0.1)
    model = b.finalize()
    target_size = 0.015

    def init_fn(model, rng):
        k_q, k_g = jax.random.split(rng)
        qpos = randomize_limited_and_rotational_joints(model, k_q)
        aux = None
        if randomize_gains:
            # random non-parallel actuation directions
            # (reference: point_mass.py:95-107 wrap_prm randomization)
            k1, k2 = jax.random.split(k_g)
            d1 = jax.random.normal(k1, (2,))
            d1 = d1 / jnp.linalg.norm(d1)
            d2 = jax.random.normal(k2, (2,))
            d2 = d2 / jnp.linalg.norm(d2)
            # nudge d2 away from d1 if nearly parallel (smooth surrogate for
            # the reference's rejection loop)
            perp = jnp.stack([-d1[1], d1[0]])
            too_par = jnp.abs(jnp.dot(d1, d2)) > 0.9
            d2 = jnp.where(too_par, perp, d2)
            aux = {"gain": jnp.stack([d1, d2])}
        return PhysState(qpos, jnp.zeros(2, jnp.float32),
                         jnp.zeros((len(model.contact_pairs),), jnp.float32),
                         task_aux=aux)

    def observe_fn(model, state):
        return {"position": state.qpos, "velocity": state.qvel}

    def reward_fn(model, state, kin, ctrl):
        dist = jnp.linalg.norm(state.qpos)  # target at the origin
        near = rewards.tolerance(dist, bounds=(0, target_size),
                                 margin=target_size)
        ctrl_r = rewards.tolerance(ctrl, margin=1, value_at_margin=0,
                                   sigmoid="quadratic")
        small_control = (jnp.mean(ctrl_r) + 4) / 5
        return near * small_control

    task = Task(name=name, model=model, n_sub_steps=1, init_fn=init_fn,
                observe_fn=observe_fn, reward_fn=reward_fn, camera_id=0,
                time_limit=20.0)
    if randomize_gains:
        base_step = task.step

        def step_mixed(state, ctrl):
            mixed = state.task_aux["gain"].T @ ctrl
            return base_step(state, mixed)

        task.step = step_mixed
    return task


@register("point_mass", "easy")
def point_mass_easy():
    return _point_mass(False, "point_mass_easy")


@register("point_mass", "hard")
def point_mass_hard():
    return _point_mass(True, "point_mass_hard")


# -------------------------------------------------------------------- hopper
def _hopper(hopping, name):
    b = ModelBuilder(timestep=0.005, integrator="euler")
    b.add_geom(0, PLANE, size=(50, 1, 0.2), pos=(48, 0, 0), material="grid",
               contype=1, conaffinity=1, name="floor")
    # hopper.xml body geoms keep MuJoCo's contype=1 conaffinity=1 defaults —
    # self-collisions (torso↔calf/foot when folded) are live in the reference
    # model, unlike walker.xml which sets conaffinity=0
    hop = dict(material="self", contype=1, conaffinity=1)
    torso = b.add_body(0, pos=(0, 0, 1), name="torso")
    b.add_joint(torso, SLIDE, axis=(1, 0, 0), name="rootx")
    b.add_joint(torso, SLIDE, axis=(0, 0, 1), name="rootz")
    b.add_joint(torso, HINGE, axis=(0, 1, 0), name="rooty")
    b.add_geom(torso, CAPSULE, size=(0.0653,), fromto=(0, 0, -0.05, 0, 0, 0.2),
               name="torso", **hop)
    b.add_geom(torso, CAPSULE, size=(0.03,), fromto=(0.08, 0, 0.13, 0.15, 0, 0.14),
               name="nose", **hop)
    pelvis = b.add_body(torso, pos=(0, 0, -0.05), name="pelvis")
    b.add_joint(pelvis, HINGE, axis=(0, 1, 0), limited=True,
                range=(_D(-30), _D(30)), damping=0.05, armature=0.2,
                name="waist")
    b.add_geom(pelvis, CAPSULE, size=(0.065,), fromto=(0, 0, 0, 0, 0, -0.15),
               name="pelvis", **hop)
    thigh = b.add_body(pelvis, pos=(0, 0, -0.2), name="thigh")
    b.add_joint(thigh, HINGE, axis=(0, 1, 0), limited=True,
                range=(_D(-170), _D(10)), damping=0.05, armature=0.2,
                name="hip")
    b.add_geom(thigh, CAPSULE, size=(0.04,), fromto=(0, 0, 0, 0, 0, -0.33),
               name="thigh", **hop)
    calf = b.add_body(thigh, pos=(0, 0, -0.33), name="calf")
    b.add_joint(calf, HINGE, axis=(0, 1, 0), limited=True,
                range=(_D(5), _D(150)), damping=0.05, armature=0.2,
                name="knee")
    b.add_geom(calf, CAPSULE, size=(0.03,), fromto=(0, 0, 0, 0, 0, -0.32),
               name="calf", **hop)
    foot = b.add_body(calf, pos=(0, 0, -0.32), name="foot")
    b.add_joint(foot, HINGE, axis=(0, 1, 0), limited=True,
                range=(_D(-45), _D(45)), damping=0.05, armature=0.2,
                name="ankle")
    b.add_geom(foot, CAPSULE, size=(0.04,), fromto=(-0.08, 0, 0, 0.17, 0, 0),
               name="foot", **hop)
    b.add_camera("cam0", pos=(0, -2.8, 0.8), euler_deg=(90, 0, 0),
                 mode="trackcom", body=torso)
    for nm, gear in (("waist", 30), ("hip", 40), ("knee", 30), ("ankle", 10)):
        b.add_actuator(nm, gear=float(gear))
    # Penalty friction is explicit-unstable for hopper's single-foot stance:
    # the interaction probes (scripts/probe_hopper.py) showed a settled
    # stance with qvel[rootx]=1.5 being launched backwards at -15 m/s and
    # all-negative torque bursts injecting 5 m/s of energy. The implicit
    # velocity-level impulse solve (same as manipulator/stacker) holds
    # stiction and keeps toe-off impulses at MuJoCo levels — but the
    # limits stay on the soft explicit springs: hopper's gait presses
    # joints into their ranges every hop, and the authority-floored
    # implicit limit stage both hard-stops that (real MuJoCo overshoots
    # the waist range by ~14% under full torque) and damps legitimate
    # escape from a violated range (the airborne knee probe).
    b.implicit_contacts = True
    b.implicit_limits = False
    model = b.finalize()

    _TORSO, _FOOT = 2, 6  # links: rootx=0, rootz=1, rooty=2, waist=3, ...

    foot_geom = next(i for i, g in enumerate(model.geoms) if g.name == "foot")
    foot_pairs = np.array([foot_geom in (int(i), int(j))
                           for (i, j) in model.contact_pairs])

    def init_fn(model, rng):
        qpos = randomize_limited_and_rotational_joints(model, rng)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((len(model.contact_pairs),), jnp.float32))

    def _touch(state):
        f = jnp.sum(state.contact_force * jnp.asarray(foot_pairs, jnp.float32))
        v = jnp.log1p(f)
        return jnp.stack([v, v])

    def observe_fn(model, state):
        return {"position": state.qpos[1:], "velocity": state.qvel,
                "touch": _touch(state)}

    def _height(kin):
        # torso COM z − foot COM z (reference: hopper.py:78-81 xipos)
        from sgqn_carla_tpu.ops import v3
        coms = kin.soa[4]
        return coms[_TORSO][2] - coms[_FOOT][2]

    def reward_fn(model, state, kin, ctrl):
        standing = rewards.tolerance(_height(kin), (0.6, 2.0))
        if hopping:
            speed = subtree_linvel(model, kin, _TORSO)[0]
            hop_r = rewards.tolerance(speed, bounds=(2.0, float("inf")),
                                      margin=1.0, value_at_margin=0.5,
                                      sigmoid="linear")
            return standing * hop_r
        small_control = jnp.mean(rewards.tolerance(
            ctrl, margin=1, value_at_margin=0, sigmoid="quadratic"))
        return standing * (small_control + 4) / 5

    return Task(name=name, model=model, n_sub_steps=4, init_fn=init_fn,
                observe_fn=observe_fn, reward_fn=reward_fn, camera_id=0,
                time_limit=20.0)


@register("hopper", "stand")
def hopper_stand():
    return _hopper(False, "hopper_stand")


@register("hopper", "hop")
def hopper_hop():
    return _hopper(True, "hopper_hop")
