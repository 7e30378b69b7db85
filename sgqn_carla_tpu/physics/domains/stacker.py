"""Stacker domain: stack_2 / stack_4.

The planar manipulator arm with 2 or 4 free boxes and a ghost target box
(reference MJCF: src/env/dm_control/dm_control/suite/stacker.xml; task math
suite/stacker.py:45-208). Arena/arm/actuators are shared with the
manipulator domain (`manipulator.build_arena/build_arm`). Boxes are planar
3-dof bodies (slide x, slide z, hinge y) with .022³ box geoms; box↔box and
box↔gripper contacts use the engine's point-sample box narrow phase
(corner-face manifolds — adequate for stacking; see physics/dense.py).

The ghost target box pose (mutated in `model.body_pos` per episode by the
reference, stacker.py:166-170) rides on two heavily-damped pose dofs
(x, z) exactly like the manipulator's receptacles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.domains.manipulator import (
    _ARM_JOINTS, _CLOSE, _CONTROL_TIMESTEP, _GRASP_OFF, _POSE_DAMP,
    _TIME_LIMIT, _TOUCH_GROUPS, build_arena, build_arm, _site_w,
)
from sgqn_carla_tpu.physics.engine import forward_kinematics
from sgqn_carla_tpu.physics.model import (
    BOX, HINGE, SLIDE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import PhysState, Task

_BOX_SIZE = 0.022
_BOX_MASS = 500.0 * (2 * _BOX_SIZE) ** 3  # density 500 (stacker.xml:26)


def make_model(n_boxes: int):
    b = ModelBuilder(timestep=0.001, integrator="euler")
    # same grasp-capable implicit contact solve as manipulator
    b.implicit_contacts = True
    build_arena(b)
    build_arm(b)
    for i in range(n_boxes):
        box = b.add_body(0, pos=(0, 0, 0), name=f"box{i}")
        b.add_joint(box, SLIDE, axis=(1, 0, 0), name=f"box{i}_x")
        b.add_joint(box, SLIDE, axis=(0, 0, 1), name=f"box{i}_z")
        b.add_joint(box, HINGE, axis=(0, 1, 0), name=f"box{i}_y")
        b.add_geom(box, BOX, size=(_BOX_SIZE,) * 3, material="self",
                   name=f"box{i}", friction=0.7, mass=_BOX_MASS)
    tgt = b.add_body(0, pos=(0, 0, 0), name="target")
    b.add_joint(tgt, SLIDE, axis=(1, 0, 0), damping=_POSE_DAMP, armature=1.0,
                name="target_x")
    b.add_joint(tgt, SLIDE, axis=(0, 0, 1), damping=_POSE_DAMP, armature=1.0,
                name="target_z")
    b.add_geom(tgt, BOX, size=(_BOX_SIZE,) * 3, material="target",
               name="target", contype=0, conaffinity=0, mass=0)
    b.add_camera("fixed", pos=(0, -16, 0.4), xyaxes=(1, 0, 0, 0, 0, 1),
                 fovy=4.0)
    return b.finalize()


def _make_task(n_boxes: int):
    model = make_model(n_boxes)
    jid = model.joint_id
    arm_dofs = np.array([jid(n) for n in _ARM_JOINTS])
    box_dofs = [(jid(f"box{i}_x"), jid(f"box{i}_z"), jid(f"box{i}_y"))
                for i in range(n_boxes)]
    box_links = [jid(f"box{i}_y") for i in range(n_boxes)]
    tgt_x, tgt_z = jid("target_x"), jid("target_z")
    tgt_link = tgt_z
    hand_link = jid("arm_wrist")
    limited = model.jnt_limited[arm_dofs]
    lo = np.where(limited, model.jnt_range[arm_dofs, 0], -np.pi)
    hi = np.where(limited, model.jnt_range[arm_dofs, 1], np.pi)
    thumb_i = list(_ARM_JOINTS).index("thumb")
    finger_i = list(_ARM_JOINTS).index("finger")
    touch_rows = []
    for grp in _TOUCH_GROUPS:
        gids = {i for i, g in enumerate(model.geoms) if g.name in grp}
        rows = [r for r, (i, j) in enumerate(np.asarray(model.contact_pairs))
                if int(i) in gids or int(j) in gids]
        touch_rows.append(np.asarray(rows, np.int32))

    from sgqn_carla_tpu.physics import dense

    def init_fn(model, rng, _nattempts=8):
        def candidate(key):
            ks = jax.random.split(key, 4 + n_boxes)
            qpos = jnp.zeros(model.nv, jnp.float32)
            angles = jax.random.uniform(ks[0], (len(arm_dofs),), jnp.float32,
                                        jnp.asarray(lo, jnp.float32),
                                        jnp.asarray(hi, jnp.float32))
            angles = angles.at[finger_i].set(angles[thumb_i])
            qpos = qpos.at[jnp.asarray(arm_dofs)].set(angles)
            # target: x ∈ ±.37, z = box_size·(2·randint(n)+1)
            # (stacker.py:166-170)
            th = jax.random.randint(ks[1], (), 0, n_boxes)
            qpos = qpos.at[tgt_x].set(
                jax.random.uniform(ks[2], (), jnp.float32, -0.37, 0.37))
            qpos = qpos.at[tgt_z].set(_BOX_SIZE * (2 * th + 1).astype(
                jnp.float32))
            for i, (bx, bz, by) in enumerate(box_dofs):
                kb = jax.random.split(ks[3 + i], 3)
                qpos = qpos.at[bx].set(
                    jax.random.uniform(kb[0], (), jnp.float32, 0.1, 0.3))
                qpos = qpos.at[bz].set(
                    jax.random.uniform(kb[1], (), jnp.float32, 0.0, 0.7))
                qpos = qpos.at[by].set(
                    jax.random.uniform(kb[2], (), jnp.float32, 0,
                                       2 * np.pi))
            return qpos

        keys = jax.random.split(rng, _nattempts)

        def pick(carry, key):
            best, found = carry
            q = candidate(key)
            ok = dense.penetration_depths_batched(model, q).max() <= 0.0
            take = ok & ~found
            best = jnp.where(take, q, best)
            return (best, found | ok), None

        (qpos, _), _ = jax.lax.scan(pick, (candidate(keys[0]), False), keys)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((len(model.contact_pairs),), jnp.float32))

    def _body2d(kin, link, orientation=True):
        q = kin.q[link]
        p = jnp.stack([kin.p[link][0], kin.p[link][2]])
        if orientation:
            return jnp.concatenate([p, jnp.stack([q[0], q[2]])])
        return p

    def observe_fn(model, state):
        kin = forward_kinematics(model, state.qpos, state.qvel)
        arm = state.qpos[jnp.asarray(arm_dofs)]
        all_box_dofs = jnp.asarray([d for t in box_dofs for d in t])
        return {
            "arm_pos": jnp.stack([jnp.sin(arm), jnp.cos(arm)], -1),
            "arm_vel": state.qvel[jnp.asarray(arm_dofs)],
            "touch": jnp.stack([
                jnp.log1p(state.contact_force[jnp.asarray(r)].sum())
                if len(r) else jnp.float32(0.0) for r in touch_rows]),
            "hand_pos": _body2d(kin, hand_link),
            "box_pos": jnp.stack([_body2d(kin, l) for l in box_links]),
            "box_vel": state.qvel[all_box_dofs],
            "target_pos": _body2d(kin, tgt_link, orientation=False),
        }

    def reward_fn(model, state, kin, ctrl):
        tp = kin.p[tgt_link]
        dists = jnp.stack([jnp.linalg.norm(kin.p[l] - tp)
                           for l in box_links])
        box_is_close = rewards.tolerance(jnp.min(dists),
                                         margin=2 * _BOX_SIZE)
        grasp = _site_w(kin, hand_link, _GRASP_OFF)
        hand_is_far = rewards.tolerance(jnp.linalg.norm(grasp - tp),
                                        bounds=(0.1, float("inf")),
                                        margin=_CLOSE)
        return box_is_close * hand_is_far

    return Task(name=f"stacker_stack_{n_boxes}", model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_TIME_LIMIT)


@register("stacker", "stack_2")
def stack_2():
    return _make_task(2)


@register("stacker", "stack_4")
def stack_4():
    return _make_task(4)
