"""Finger domain: spin / turn_easy / turn_hard.

Geometry and task math follow the published dm_control finger description
(reference: src/env/dm_control/dm_control/suite/finger.xml — gravity
disabled, proximal hinge ref=-90°, spinner with frictionloss 0.1 — and
suite/finger.py:131-216). The per-episode Turn target position lives in
`PhysState.task_aux` instead of mutated model fields (the reference writes
`site_pos['target']`, finger.py:180-186).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics
from sgqn_carla_tpu.physics.model import (
    CAPSULE, CYLINDER, HINGE, PLANE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import PhysState, Task

_DEFAULT_TIME_LIMIT = 20.0
_CONTROL_TIMESTEP = 0.02
_EASY_TARGET_SIZE = 0.07
_HARD_TARGET_SIZE = 0.03
_SPIN_VELOCITY = 15.0
_D = np.deg2rad

_SPINNER_POS = np.array([0.2, 0.0, 0.4])
_SPIN_RADIUS = 0.04 + 0.09  # cap1 size sum (finger.py:180-182)


def make_model(spin: bool):
    # dt 0.0025 (4 substeps per MuJoCo 0.01 step): the light finger/spinner
    # parts need a smaller explicit step for the penalty contacts
    b = ModelBuilder(timestep=0.0025, gravity=(0, 0, 0), integrator="euler")
    # stiff contact solve: the spinner is driven paddle-wheel style by brief
    # fingertip-arm impulses; with the default solref (0.02) the penalty
    # transfer is ~8x weaker than MuJoCo's elliptic-cone solver (finger.xml
    # option cone="elliptic" iterations="200") and spin can never reach the
    # 15 rad/s reward threshold. (0.005, 1.0) matches the real-MuJoCo
    # scripted-rub peak (21.6 vs 21.0 rad/s; see docs/PERF.md).
    b.contact_solref = (0.005, 1.0)
    b.add_geom(0, PLANE, size=(0.6, 0.2, 10), material="grid", name="ground")

    prox = b.add_body(0, pos=(-0.2, 0, 0.4), name="proximal")
    b.add_joint(prox, HINGE, axis=(0, -1, 0), limited=True,
                range=(_D(-110), _D(110)), ref=_D(-90), damping=2.5,
                name="proximal")
    b.add_geom(prox, CYLINDER, size=(0.034, 0.033), zaxis=(0, 1, 0),
               material="decoration", name="proximal_decoration")
    b.add_geom(prox, CAPSULE, size=(0.03,), fromto=(0, 0, 0, 0, 0, -0.17),
               material="self", name="proximal")
    dist = b.add_body(prox, pos=(0, 0, -0.18), name="distal")
    b.add_joint(dist, HINGE, axis=(0, -1, 0), limited=True,
                range=(_D(-110), _D(110)), damping=2.5, name="distal")
    b.add_geom(dist, CAPSULE, size=(0.028,), fromto=(0, 0, 0, 0, 0, -0.16),
               material="self", name="distal", contype=0, conaffinity=0)
    b.add_geom(dist, CAPSULE, size=(0.03,), fromto=(0, 0, -0.13, 0, 0, -0.161),
               material="effector", name="fingertip")

    spinner = b.add_body(0, pos=(0.2, 0, 0.4), name="spinner")
    # Spin lowers hinge damping to .03 (finger.py:148)
    b.add_joint(spinner, HINGE, axis=(0, -1, 0),
                damping=0.03 if spin else 0.5, frictionloss=0.1, name="hinge")
    b.add_geom(spinner, CAPSULE, size=(0.04, 0.09), pos=(0.02, 0, 0),
               material="self", name="cap1")
    b.add_geom(spinner, CAPSULE, size=(0.04, 0.09), pos=(-0.02, 0, 0),
               material="self", name="cap2")
    # "tip" is a *site* in finger.xml:44 — massless marker, not an inertial
    # geom; keep it as a zero-mass visual geom here
    b.add_geom(spinner, SPHERE, size=(0.02,), pos=(0, 0, 0.13),
               material="target", name="tip", contype=0, conaffinity=0,
               mass=0.0, rgba=(0.6, 0.3, 0.3, 0.0 if spin else 1.0))
    b.add_geom(spinner, CYLINDER, size=(0.02, 0.045), zaxis=(0, 1, 0),
               material="decoration", name="spinner_decoration")
    # target site (world; Turn moves it per episode via render_overrides)
    b.add_geom(0, SPHERE, size=(0.03,), pos=(0, 0, 0.4), material="target",
               name="target", contype=0, conaffinity=0,
               rgba=(0.6, 0.3, 0.3, 0.0 if spin else 1.0))

    b.add_camera("cam0", pos=(0, -1, 0.8), xyaxes=(1, 0, 0, 0, 1, 2))
    b.add_camera("cam1", pos=(0, -1, 0.4), xyaxes=(1, 0, 0, 0, 0, 1))
    b.add_actuator("proximal", gear=30.0)
    b.add_actuator("distal", gear=15.0)
    # contact gains are inertia-scaled per pair by the engine
    # (engine.constraint_scales), sized automatically to the light parts
    return b.finalize()


def _geom_idx(model, name):
    return next(i for i, g in enumerate(model.geoms) if g.name == name)


def _tip_pos(model, kin):
    """World (x, z) of the spinner tip site (0, 0, .13 in spinner frame)."""
    sl = model.joint_id("hinge")
    p = kin.p[sl] + kin.R[sl] @ jnp.asarray([0.0, 0.0, 0.13], kin.R.dtype)
    return jnp.stack([p[0], p[2]])


def _touch(model, state: PhysState):
    """log1p of contact force near the fingertip (reference touch sensors,
    finger.py:92-94); both sensors read the same aggregate here."""
    tip_geom = _geom_idx(model, "fingertip")
    pair_mask = np.array([tip_geom in (int(i), int(j))
                          for (i, j) in model.contact_pairs])
    f = jnp.sum(state.contact_force * jnp.asarray(pair_mask, jnp.float32))
    v = jnp.log1p(f)
    return jnp.stack([v, v])


def _observe_spin(model, state: PhysState):
    kin = forward_kinematics(model, state.qpos, state.qvel)
    pj, dj = model.joint_id("proximal"), model.joint_id("distal")
    tip = _tip_pos(model, kin)
    rel = tip - jnp.asarray(_SPINNER_POS[[0, 2]], jnp.float32)
    position = jnp.concatenate([state.qpos[jnp.asarray([pj, dj])], rel])
    return {"position": position, "velocity": state.qvel,
            "touch": _touch(model, state)}


def _init_common(model, rng):
    """Collision-free random joint angles (reference retries until
    physics.data.ncon == 0, finger.py:206-216). Here: draw 8 candidates,
    take the first penetration-free one (min-penetration fallback)."""
    from sgqn_carla_tpu.physics.engine import max_penetration

    def draw(key):
        keys = jax.random.split(key, model.nv)
        qpos = jnp.zeros(model.nv, jnp.float32)
        for i in range(model.nv):
            lo, hi = float(model.jnt_range[i, 0]), float(model.jnt_range[i, 1])
            if bool(model.jnt_limited[i]):
                qpos = qpos.at[i].set(
                    jax.random.uniform(keys[i], (), jnp.float32, lo, hi))
            else:
                qpos = qpos.at[i].set(
                    jax.random.uniform(keys[i], (), jnp.float32,
                                       -jnp.pi, jnp.pi))
        return qpos

    cands = jax.vmap(draw)(jax.random.split(rng, 8))
    pens = jax.vmap(lambda q: max_penetration(model, q))(cands)
    free = pens <= 0.0
    first_free = jnp.argmax(free)  # first True, or 0 if none
    idx = jnp.where(jnp.any(free), first_free, jnp.argmin(pens))
    return cands[idx]


def _make_spin():
    model = make_model(spin=True)
    hinge = model.joint_id("hinge")

    def init_fn(model, rng):
        qpos = _init_common(model, rng)
        npair = len(model.contact_pairs)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((npair,), jnp.float32))

    def reward_fn(model, state, kin, ctrl):
        return (state.qvel[hinge] <= -_SPIN_VELOCITY).astype(jnp.float32)

    return Task(name="finger_spin", model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=_observe_spin,
                reward_fn=reward_fn, camera_id=0,
                time_limit=_DEFAULT_TIME_LIMIT)


def _make_turn(target_size, name):
    model = make_model(spin=False)
    target_geom = _geom_idx(model, "target")
    hinge_anchor = _SPINNER_POS  # hinge passes through the spinner origin

    def init_fn(model, rng):
        k_q, k_a = jax.random.split(rng)
        qpos = _init_common(model, k_q)
        angle = jax.random.uniform(k_a, (), jnp.float32, -jnp.pi, jnp.pi)
        target_xz = jnp.stack([
            hinge_anchor[0] + _SPIN_RADIUS * jnp.sin(angle),
            hinge_anchor[2] + _SPIN_RADIUS * jnp.cos(angle)])
        npair = len(model.contact_pairs)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((npair,), jnp.float32),
                         task_aux={"target_xz": target_xz})

    def observe_fn(model, state):
        obs = _observe_spin(model, state)
        kin = forward_kinematics(model, state.qpos, state.qvel)
        tip = _tip_pos(model, kin)
        target_rel = state.task_aux["target_xz"] - jnp.asarray(
            _SPINNER_POS[[0, 2]], jnp.float32)
        dist = jnp.linalg.norm(state.task_aux["target_xz"] - tip) - target_size
        obs["target_position"] = target_rel
        obs["dist_to_target"] = dist
        return obs

    def reward_fn(model, state, kin, ctrl):
        tip = _tip_pos(model, kin)
        dist = jnp.linalg.norm(state.task_aux["target_xz"] - tip) - target_size
        return (dist <= 0).astype(jnp.float32)

    def render_overrides(model, phys_state):
        xz = phys_state.task_aux["target_xz"]
        return {target_geom: jnp.stack([xz[0], jnp.float32(0.0), xz[1]])}

    return Task(name=name, model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
                render_overrides_fn=render_overrides)


@register("finger", "spin")
def spin():
    return _make_spin()


@register("finger", "turn_easy")
def turn_easy():
    return _make_turn(_EASY_TARGET_SIZE, "finger_turn_easy")


@register("finger", "turn_hard")
def turn_hard():
    return _make_turn(_HARD_TARGET_SIZE, "finger_turn_hard")
