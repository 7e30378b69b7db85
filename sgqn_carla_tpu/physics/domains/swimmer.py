"""Swimmer domain: swimmer6 / swimmer15.

Procedurally chained planar swimmer in a dense fluid medium (reference:
src/env/dm_control/dm_control/suite/swimmer.py:88-215 and swimmer.xml).
Contact is disabled; all locomotion force comes from the medium
(swimmer.xml `<option density="3000">` → engine.fluid_taus). The head
carries a planar free root (slide x, slide y, hinge z at the tail end of
the head segment); each of the n−1 child segments adds a z-hinge limited
to ±360/n degrees with armature 1e-6 and a gear-5e-4 motor.

The per-episode target position lives in `task_aux` (the reference mutates
`model.geom_pos['target']`, swimmer.py:188-193).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import (
    _point_velocity, forward_kinematics,
)
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, ELLIPSOID, HINGE, PLANE, SLIDE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import (
    PhysState, Task, randomize_limited_and_rotational_joints,
)

_DEFAULT_TIME_LIMIT = 30.0
_CONTROL_TIMESTEP = 0.03   # reference: swimmer.py:34-35
_TARGET_SIZE = 0.1
_D = np.deg2rad

_HEAD_LINK = 2  # rootx, rooty, rootz → head body is the 3rd chain link


def make_model(n_links: int):
    b = ModelBuilder(timestep=0.002, integrator="euler", density=3000.0)
    b.add_geom(0, PLANE, size=(2, 2, 0.1), material="grid", name="ground",
               contype=0, conaffinity=0)

    head = b.add_body(0, pos=(0, 0, 0.05), name="head")
    # planar free root at the head's tail end (swimmer.xml joints pos 0 -.05 0)
    b.add_joint(head, SLIDE, axis=(1, 0, 0), pos=(0, -0.05, 0), name="rootx")
    b.add_joint(head, SLIDE, axis=(0, 1, 0), pos=(0, -0.05, 0), name="rooty")
    b.add_joint(head, HINGE, axis=(0, 0, 1), pos=(0, -0.05, 0), name="rootz")
    # decorative head geoms (mass 0); the inertial box carries the mass
    b.add_geom(head, ELLIPSOID, size=(0.02, 0.04, 0.017), pos=(0, -0.022, 0),
               material="self", name="head", mass=0, contype=0, conaffinity=0)
    b.add_geom(head, SPHERE, size=(0.004,), pos=(0, -0.06, 0),
               material="effector", name="nose", mass=0, contype=0,
               conaffinity=0)
    b.add_geom(head, CAPSULE, size=(0.004,),
               fromto=(-0.006, -0.054, 0.005, 0.006, -0.054, 0.005),
               material="eye", name="eyes", mass=0, contype=0, conaffinity=0)
    b.add_geom(head, BOX, size=(0.001, 0.05, 0.01), mass=0.01,
               rgba=(0, 0, 0, 0), name="inertial_head", contype=0,
               conaffinity=0)
    b.add_geom(head, CAPSULE, size=(0.01,), fromto=(0, -0.05, 0, 0, 0.05, 0),
               material="self", name="visual_head", mass=0, contype=0,
               conaffinity=0)

    joint_limit = _D(360.0 / n_links)
    parent = head
    for i in range(n_links - 1):
        seg = b.add_body(parent, pos=(0, 0.1, 0), name=f"segment_{i}")
        b.add_joint(seg, HINGE, axis=(0, 0, 1), pos=(0, -0.05, 0),
                    limited=True, range=(-joint_limit, joint_limit),
                    armature=1e-6, name=f"joint_{i}")
        b.add_geom(seg, CAPSULE, size=(0.01,), fromto=(0, -0.05, 0, 0, 0.05, 0),
                   material="self", name=f"visual_{i}", mass=0, contype=0,
                   conaffinity=0)
        b.add_geom(seg, BOX, size=(0.001, 0.05, 0.01), mass=0.01,
                   rgba=(0, 0, 0, 0), name=f"inertial_{i}", contype=0,
                   conaffinity=0)
        b.add_actuator(f"joint_{i}", gear=5e-4)
        parent = seg

    # target (moved per episode via render_overrides)
    b.add_geom(0, SPHERE, size=(_TARGET_SIZE,), pos=(1, 1, 0.05),
               material="target", name="target", contype=0, conaffinity=0)

    # tracking cameras scaled with body count (swimmer.py:118-126)
    scale = n_links / 6.0
    b.add_camera("tracking1", pos=(0, -0.2 * scale, 0.5 * scale),
                 xyaxes=(1, 0, 0, 0, 1, 1), mode="trackcom", fovy=60.0,
                 body=head)
    b.add_camera("tracking2", pos=(-0.9 * scale, 0.5 * scale, 0.15 * scale),
                 xyaxes=(0, -1, 0, 0.3, 0, 1), mode="trackcom", fovy=60.0,
                 body=head)
    # joint-limit gains are inertia-scaled per dof by the engine
    # (engine.constraint_scales) — stable for the tiny segment inertias
    return b.finalize()


def _make(n_links, name):
    model = make_model(n_links)
    target_geom = next(i for i, g in enumerate(model.geoms)
                       if g.name == "target")
    seg_links = [_HEAD_LINK + 1 + i for i in range(n_links - 1)]

    def init_fn(model, rng):
        k_j, k_c, k_t = jax.random.split(rng, 3)
        qpos = randomize_limited_and_rotational_joints(model, k_j)
        close = jax.random.uniform(k_c, ()) < 0.2  # swimmer.py:189
        box = jnp.where(close, 0.3, 2.0)
        xy = jax.random.uniform(k_t, (2,), jnp.float32, -1.0, 1.0) * box
        npair = len(model.contact_pairs)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((npair,), jnp.float32),
                         task_aux={"target_xy": xy})

    def _nose_to_target(state, kin):
        """Vector nose→target in head-local coordinates, xy (swimmer.py:146-151)."""
        Rh = kin.R[_HEAD_LINK]
        nose = kin.p[_HEAD_LINK] + Rh @ jnp.asarray([0, -0.06, 0], Rh.dtype)
        tgt = jnp.concatenate([state.task_aux["target_xy"],
                               jnp.asarray([0.05], jnp.float32)])
        return (Rh.T @ (tgt - nose))[:2]

    def observe_fn(model, state):
        kin = forward_kinematics(model, state.qpos, state.qvel)
        vels = []
        for l in seg_links:
            Rl = kin.R[l]
            v_w = jnp.stack(_point_velocity(kin, l, tuple(kin.p[l])))
            w_w = kin.v[l, :3]
            v_l = Rl.T @ v_w
            w_l = Rl.T @ w_w
            vels.append(jnp.stack([v_l[0], v_l[1], w_l[2]]))
        return {
            "joints": state.qpos[3:],
            "to_target": _nose_to_target(state, kin),
            "body_velocities": jnp.concatenate(vels),
        }

    def reward_fn(model, state, kin, ctrl):
        dist = jnp.linalg.norm(_nose_to_target(state, kin))
        return rewards.tolerance(dist, bounds=(0, _TARGET_SIZE),
                                 margin=5 * _TARGET_SIZE,
                                 sigmoid="long_tail")

    def render_overrides(model, phys_state):
        xy = phys_state.task_aux["target_xy"]
        return {target_geom: jnp.stack([xy[0], xy[1], jnp.float32(0.05)])}

    return Task(name=name, model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
                render_overrides_fn=render_overrides)


@register("swimmer", "swimmer6")
def swimmer6():
    return _make(6, "swimmer_swimmer6")


@register("swimmer", "swimmer15")
def swimmer15():
    return _make(15, "swimmer_swimmer15")
