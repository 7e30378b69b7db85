"""Manipulator domain: bring_ball / bring_peg / insert_ball / insert_peg.

Planar 4-link arm with a two-finger gripper (reference MJCF:
src/env/dm_control/dm_control/suite/manipulator.xml; task math
suite/manipulator.py:48-290). The arm is arm_root (unlimited, damping 2) →
shoulder (±160°, 1.5) → elbow (±160°, 1) → wrist (±140°, .5) with the
`hand` class thumb/finger (damping .5, −10..60°) and `fingertip` tip
joints (damping .01, stiffness .01, −40..20°); capsule geoms density 500.
Actuation: joint motors gear 12/8/4/2 + a grasp tendon motor gear 2
(thumb .5 + finger .5); the thumb/finger coupling equality becomes a stiff
passive tendon spring (manipulator.xml:185-193).

Props are planar free bodies (slide x, slide z, hinge y — matching the
reference's explicit 3-joint planar prop, manipulator.xml:122-143).

Per-episode receptacle and ghost-target poses: the reference mutates
`model.body_pos/body_quat` at reset (suite/manipulator.py:216-224);
models here are immutable constants, so these bodies ride on three "pose
dofs" (slide x, slide z, hinge y) with damping 1e6 — contact loads of
~10 N drift them < 0.1 mm over a 10 s episode, gravity less, while init
simply writes the sampled pose into qpos and FK/rendering/collision all
see it. Ghost targets are massless + contactless (armature keeps the
mass matrix regular).

Approximations (documented):
  * slot/cup collision: the slot's boxes use the engine's point-sample
    box narrow phase (corner-face manifolds, no edge-edge);
  * touch sensors report log1p of summed contact normal forces over the
    associated geoms' pairs instead of MuJoCo site-volume force readout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, CYLINDER, HINGE, PLANE, SLIDE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import PhysState, Task

_CLOSE = 0.01
_CONTROL_TIMESTEP = 0.01
_TIME_LIMIT = 10.0
_P_IN_HAND = 0.1
_P_IN_TARGET = 0.1
_D = np.deg2rad

_ARM_JOINTS = ("arm_root", "arm_shoulder", "arm_elbow", "arm_wrist",
               "finger", "fingertip", "thumb", "thumbtip")
_POSE_DAMP = 1e6


def _cap_mass(r, length, density=500.0):
    hl = length / 2
    return density * (np.pi * r * r * (2 * hl)
                      + 4.0 / 3.0 * np.pi * r ** 3)


def _fromto_len(ft):
    a, b = np.asarray(ft[:3]), np.asarray(ft[3:])
    return float(np.linalg.norm(b - a))


def build_arena(b: ModelBuilder):
    """Shared planar arena (manipulator.xml:60-64 == stacker.xml:60-64);
    the background plane is visual-only."""
    b.add_geom(0, PLANE, size=(0.4, 0.2, 10), material="grid", name="floor",
               friction=0.7)
    b.add_geom(0, PLANE, size=(0.4, 0.2, 10), pos=(-0.682843, 0, 0.282843),
               zaxis=(1, 0, 1), material="grid", name="wall1", friction=0.7)
    b.add_geom(0, PLANE, size=(0.4, 0.2, 10), pos=(0.682843, 0, 0.282843),
               zaxis=(-1, 0, 1), material="grid", name="wall2", friction=0.7)
    b.add_geom(0, CYLINDER, size=(0.024, 0.022), pos=(0, 0, 0.4),
               euler_deg=(90, 0, 0), material="decoration", name="arm_root",
               contype=0, conaffinity=0, mass=0)


def _mk_cap(b):
    def cap(body, name, fromto, r, density=500.0, material="self",
            friction=0.7, **kw):
        b.add_geom(body, CAPSULE, size=(r,), fromto=fromto, material=material,
                   name=name, friction=friction,
                   mass=_cap_mass(r, _fromto_len(fromto), density), **kw)
    return cap


def build_arm(b: ModelBuilder):
    """The shared 4-link arm + two-finger gripper (manipulator.xml:69-119
    == stacker.xml:70-120) and its actuators/coupling."""
    cap = _mk_cap(b)
    upper = b.add_body(0, pos=(0, 0, 0.4), name="upper_arm")
    b.add_joint(upper, HINGE, axis=(0, -1, 0), damping=2.0, name="arm_root")
    cap(upper, "upper_arm", (0, 0, 0, 0, 0, 0.18), 0.02)
    middle = b.add_body(upper, pos=(0, 0, 0.18), name="middle_arm")
    b.add_joint(middle, HINGE, axis=(0, -1, 0), damping=1.5, limited=True,
                range=(_D(-160), _D(160)), name="arm_shoulder")
    cap(middle, "middle_arm", (0, 0, 0, 0, 0, 0.15), 0.017)
    lower = b.add_body(middle, pos=(0, 0, 0.15), name="lower_arm")
    b.add_joint(lower, HINGE, axis=(0, -1, 0), damping=1.0, limited=True,
                range=(_D(-160), _D(160)), name="arm_elbow")
    cap(lower, "lower_arm", (0, 0, 0, 0, 0, 0.12), 0.014)
    hand = b.add_body(lower, pos=(0, 0, 0.12), name="hand")
    b.add_joint(hand, HINGE, axis=(0, -1, 0), damping=0.5, limited=True,
                range=(_D(-140), _D(140)), name="arm_wrist")
    cap(hand, "hand", (0, 0, 0, 0, 0, 0.03), 0.011)
    cap(hand, "palm1", (0, 0, 0.03, 0.03, 0, 0.045), 0.008)
    cap(hand, "palm2", (0, 0, 0.03, -0.03, 0, 0.045), 0.008)

    for side, sx, eul in (("thumb", 1, (0, -90, 0)), ("finger", -1,
                                                      (0, 90, 180))):
        digit = b.add_body(hand, pos=(sx * 0.03, 0, 0.045), euler_deg=eul,
                           name=side)
        b.add_joint(digit, HINGE, axis=(0, -1, 0), damping=0.5, limited=True,
                    range=(_D(-10), _D(60)), name=side)
        cap(digit, f"{side}1", (0, 0, 0, 0.02, 0, -0.01), 0.007)
        cap(digit, f"{side}2", (0.02, 0, -0.01, 0.04, 0, -0.01), 0.007)
        tip = b.add_body(digit, pos=(0.05, 0, -0.01), name=f"{side}tip")
        b.add_joint(tip, HINGE, axis=(0, -1, 0), damping=0.01,
                    stiffness=0.01, limited=True, range=(_D(-40), _D(20)),
                    name=f"{side}tip")
        b.add_geom(tip, SPHERE, size=(0.008,), pos=(-0.003, 0, 0),
                   material="effector", name=f"{side}tip1", friction=0.7,
                   mass=_cap_mass(0.008, 0))
        b.add_geom(tip, SPHERE, size=(0.008,), pos=(0.003, 0, 0),
                   material="effector", name=f"{side}tip2", friction=0.7,
                   mass=_cap_mass(0.008, 0))

    # actuators (manipulator.xml:203-209 == stacker.xml:186-192)
    b.add_actuator("arm_root", 12.0)
    b.add_actuator("arm_shoulder", 8.0)
    b.add_actuator("arm_elbow", 4.0)
    b.add_actuator("arm_wrist", 2.0)
    b.add_tendon_motor([("thumb", 0.5), ("finger", 0.5)], gear=2.0)
    # coupling equality → stiff spring (manipulator.xml:185-193)
    b.add_fixed_tendon_spring([("thumb", -0.5), ("finger", 0.5)],
                              stiffness=100.0)
    return hand


def make_model(use_peg: bool, insert: bool):
    b = ModelBuilder(timestep=0.001, integrator="euler")
    # grasping needs constraint-style contacts: explicit penalties cannot
    # hold the ball in the gripper (see Model.implicit_contacts)
    b.implicit_contacts = True
    build_arena(b)
    build_arm(b)
    cap = _mk_cap(b)

    # ---- prop: planar free body (slide x, slide z, hinge y)
    obj = b.add_body(0, pos=(0, 0, 0), name="peg" if use_peg else "ball")
    b.add_joint(obj, SLIDE, axis=(1, 0, 0), name="object_x")
    b.add_joint(obj, SLIDE, axis=(0, 0, 1), name="object_z")
    b.add_joint(obj, HINGE, axis=(0, 1, 0), name="object_y")
    if use_peg:
        cap(obj, "blade", (0, 0, -0.013, 0, 0, -0.113), 0.005)
        cap(obj, "guard", (-0.017, 0, -0.043, 0.017, 0, -0.043), 0.005)
        b.add_geom(obj, SPHERE, size=(0.009,), pos=(0, 0, -0.013),
                   material="self", name="pommel", friction=0.7,
                   mass=_cap_mass(0.009, 0))
    else:
        b.add_geom(obj, SPHERE, size=(0.022,), material="self", name="ball",
                   friction=0.7, mass=_cap_mass(0.022, 0))

    # ---- ghost target (massless, contactless, pose dofs)
    tgt = b.add_body(0, pos=(0, 0, 0), name="target")
    for jn, ax, jt in (("target_x", (1, 0, 0), SLIDE),
                       ("target_z", (0, 0, 1), SLIDE),
                       ("target_y", (0, 1, 0), HINGE)):
        b.add_joint(tgt, jt, axis=ax, damping=_POSE_DAMP, armature=1.0,
                    name=jn)
    if use_peg:
        b.add_geom(tgt, CAPSULE, size=(0.005,),
                   fromto=(0, 0, -0.013, 0, 0, -0.113), material="target",
                   name="target_blade", contype=0, conaffinity=0, mass=0)
        b.add_geom(tgt, CAPSULE, size=(0.005,),
                   fromto=(-0.017, 0, -0.043, 0.017, 0, -0.043),
                   material="target", name="target_guard", contype=0,
                   conaffinity=0, mass=0)
        b.add_geom(tgt, SPHERE, size=(0.009,), pos=(0, 0, -0.013),
                   material="target", name="target_pommel", contype=0,
                   conaffinity=0, mass=0)
    else:
        b.add_geom(tgt, SPHERE, size=(0.02,), material="target",
                   name="target_ball", contype=0, conaffinity=0, mass=0)

    # ---- receptacle (colliding obstacle, pose dofs)
    if insert:
        rec = b.add_body(0, pos=(0, 0, 0),
                         name="slot" if use_peg else "cup")
        for jn, ax, jt in (("rec_x", (1, 0, 0), SLIDE),
                           ("rec_z", (0, 0, 1), SLIDE),
                           ("rec_y", (0, 1, 0), HINGE)):
            b.add_joint(rec, jt, axis=ax, damping=_POSE_DAMP, armature=1.0,
                        name=jn)
        if use_peg:
            for nm, pos, size in (("slot_0", (-0.0252, 0, -0.083),
                                   (0.0198, 0.01, 0.035)),
                                  ("slot_1", (0.0252, 0, -0.083),
                                   (0.0198, 0.01, 0.035)),
                                  ("slot_2", (0, 0, -0.138),
                                   (0.045, 0.01, 0.02))):
                b.add_geom(rec, BOX, size=size, pos=pos,
                           material="decoration", name=nm, friction=0.0,
                           mass=0.01)
        else:
            for nm, ft in (("cup_0", (-0.03, 0, 0.06, -0.03, 0, -0.015)),
                           ("cup_1", (-0.03, 0, -0.015, 0, 0, -0.04)),
                           ("cup_2", (0, 0, -0.04, 0.03, 0, -0.015)),
                           ("cup_3", (0.03, 0, -0.015, 0.03, 0, 0.06))):
                # obstacle class: friction 0 (manipulator.xml:48-50)
                cap(rec, nm, ft, 0.008, material="decoration",
                    friction=0.0)

    b.add_camera("fixed", pos=(0, -16, 0.4), xyaxes=(1, 0, 0, 0, 0, 1),
                 fovy=4.0)
    return b.finalize()


# local site offsets (hand frame / prop frame; manipulator.xml sites)
_GRASP_OFF = np.array([0.0, 0.0, 0.065])
_PINCH_OFF = np.array([0.0, 0.0, 0.09])
_PEG_SITES = {"peg_grasp": (0, 0, 0), "peg_pinch": (0, 0, -0.025),
              "peg": (0, 0, -0.063), "peg_tip": (0, 0, -0.113)}

# touch sensor → geom-name groups (approximated from contact forces)
_TOUCH_GROUPS = (("palm1", "palm2"), ("finger1", "finger2"),
                 ("thumb1", "thumb2"), ("fingertip1", "fingertip2"),
                 ("thumbtip1", "thumbtip2"))


def _site_w(kin, link, off):
    return kin.p[link] + kin.R[link] @ jnp.asarray(off, jnp.float32)


def _make_task(use_peg: bool, insert: bool, task_name: str):
    model = make_model(use_peg, insert)
    jid = model.joint_id
    arm_dofs = np.array([jid(n) for n in _ARM_JOINTS])
    obj_x, obj_z, obj_y = jid("object_x"), jid("object_z"), jid("object_y")
    tgt_x, tgt_z, tgt_y = jid("target_x"), jid("target_z"), jid("target_y")
    rec = (jid("rec_x"), jid("rec_z"), jid("rec_y")) if insert else None
    hand_link = jid("arm_wrist")
    obj_link = obj_y       # last dof link of the prop chain carries the body
    tgt_link = tgt_y
    limited = model.jnt_limited[arm_dofs]
    lo = np.where(limited, model.jnt_range[arm_dofs, 0], -np.pi)
    hi = np.where(limited, model.jnt_range[arm_dofs, 1], np.pi)
    thumb_i = list(_ARM_JOINTS).index("thumb")
    finger_i = list(_ARM_JOINTS).index("finger")
    # per-touch-group contact-pair rows
    touch_rows = []
    for grp in _TOUCH_GROUPS:
        gids = {i for i, g in enumerate(model.geoms) if g.name in grp}
        rows = [r for r, (i, j) in enumerate(np.asarray(model.contact_pairs))
                if int(i) in gids or int(j) in gids]
        touch_rows.append(np.asarray(rows, np.int32))

    from sgqn_carla_tpu.physics import dense

    def _penetration(qpos):
        return dense.penetration_depths_batched(model, qpos).max()

    def init_fn(model, rng, _nattempts=8):
        def candidate(key):
            ks = jax.random.split(key, 8)
            qpos = jnp.zeros(model.nv, jnp.float32)
            angles = jax.random.uniform(ks[0], (len(arm_dofs),), jnp.float32,
                                        jnp.asarray(lo, jnp.float32),
                                        jnp.asarray(hi, jnp.float32))
            # symmetrize hand (manipulator.py:209)
            angles = angles.at[finger_i].set(angles[thumb_i])
            qpos = qpos.at[jnp.asarray(arm_dofs)].set(angles)
            target_x = jax.random.uniform(ks[1], (), jnp.float32, -0.4, 0.4)
            target_z = jax.random.uniform(ks[2], (), jnp.float32, 0.1, 0.4)
            if insert:
                target_angle = jax.random.uniform(
                    ks[3], (), jnp.float32, -np.pi / 3, np.pi / 3)
            else:
                target_angle = jax.random.uniform(
                    ks[3], (), jnp.float32, -np.pi, np.pi)
            qpos = qpos.at[tgt_x].set(target_x).at[tgt_z].set(
                target_z).at[tgt_y].set(target_angle)
            if insert:
                qpos = qpos.at[rec[0]].set(target_x).at[rec[1]].set(
                    target_z).at[rec[2]].set(target_angle)
            # object init: in_hand / in_target / uniform
            u = jax.random.uniform(ks[4], (), jnp.float32)
            kin0 = forward_kinematics(model, qpos, jnp.zeros_like(qpos))
            grasp = _site_w(kin0, hand_link, _GRASP_OFF)
            Rh = kin0.R[hand_link]
            hand_angle = jnp.pi - jnp.arctan2(Rh[2, 0], Rh[0, 0])
            ux = jax.random.uniform(ks[5], (), jnp.float32, -0.5, 0.5)
            uz = jax.random.uniform(ks[6], (), jnp.float32, 0.0, 0.7)
            ua = jax.random.uniform(ks[7], (), jnp.float32, 0, 2 * np.pi)
            in_hand = u < _P_IN_HAND
            in_tgt = (u >= _P_IN_HAND) & (u < _P_IN_HAND + _P_IN_TARGET)
            ox = jnp.where(in_hand, grasp[0], jnp.where(in_tgt, target_x, ux))
            oz = jnp.where(in_hand, grasp[2], jnp.where(in_tgt, target_z, uz))
            oa = jnp.where(in_hand, hand_angle,
                           jnp.where(in_tgt, target_angle, ua))
            qpos = qpos.at[obj_x].set(ox).at[obj_z].set(oz).at[obj_y].set(oa)
            return qpos

        # bounded rejection: first candidate with no penetration
        # (reference loops until collision-free, manipulator.py:197-250)
        keys = jax.random.split(rng, _nattempts)

        def pick(carry, key):
            best, found = carry
            q = candidate(key)
            ok = _penetration(q) <= 0.0
            take = ok & ~found
            best = jnp.where(take, q, best)
            return (best, found | ok), None

        (qpos, _), _ = jax.lax.scan(pick, (candidate(keys[0]), False), keys)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((len(model.contact_pairs),), jnp.float32))

    def _body2d(kin, link):
        q = kin.q[link]
        return jnp.stack([kin.p[link][0], kin.p[link][2], q[0], q[2]])

    def observe_fn(model, state):
        kin = forward_kinematics(model, state.qpos, state.qvel)
        arm = state.qpos[jnp.asarray(arm_dofs)]
        obs = {
            "arm_pos": jnp.stack([jnp.sin(arm), jnp.cos(arm)], -1),
            "arm_vel": state.qvel[jnp.asarray(arm_dofs)],
            "touch": jnp.stack([
                jnp.log1p(state.contact_force[jnp.asarray(r)].sum())
                if len(r) else jnp.float32(0.0) for r in touch_rows]),
            "hand_pos": _body2d(kin, hand_link),
            "object_pos": _body2d(kin, obj_link),
            "object_vel": state.qvel[jnp.asarray([obj_x, obj_z, obj_y])],
            "target_pos": _body2d(kin, tgt_link),
        }
        return obs

    def _is_close(d):
        return rewards.tolerance(d, bounds=(0, _CLOSE), margin=_CLOSE * 2)

    def reward_fn(model, state, kin, ctrl):
        if use_peg:
            grasp = _site_w(kin, hand_link, _GRASP_OFF)
            pinch = _site_w(kin, hand_link, _PINCH_OFF)
            pg = _site_w(kin, obj_link, _PEG_SITES["peg_grasp"])
            pp = _site_w(kin, obj_link, _PEG_SITES["peg_pinch"])
            peg = _site_w(kin, obj_link, _PEG_SITES["peg"])
            tip = _site_w(kin, obj_link, _PEG_SITES["peg_tip"])
            tpeg = _site_w(kin, tgt_link, _PEG_SITES["peg"])
            ttip = _site_w(kin, tgt_link, _PEG_SITES["peg_tip"])
            grasping = (_is_close(jnp.linalg.norm(pg - grasp))
                        + _is_close(jnp.linalg.norm(pp - pinch))) / 2
            bringing = (_is_close(jnp.linalg.norm(peg - tpeg))
                        + _is_close(jnp.linalg.norm(tip - ttip))) / 2
            return jnp.maximum(bringing, grasping / 3)
        d = jnp.linalg.norm(kin.p[obj_link] - kin.p[tgt_link])
        return _is_close(d)

    return Task(name=f"manipulator_{task_name}", model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_TIME_LIMIT)


@register("manipulator", "bring_ball")
def bring_ball():
    return _make_task(False, False, "bring_ball")


@register("manipulator", "bring_peg")
def bring_peg():
    return _make_task(True, False, "bring_peg")


@register("manipulator", "insert_ball")
def insert_ball():
    return _make_task(False, True, "insert_ball")


@register("manipulator", "insert_peg")
def insert_peg():
    return _make_task(True, True, "insert_peg")
