"""Quadruped domain: walk / run / fetch / escape.

Four-legged walker on a free root (reference MJCF:
src/env/dm_control/dm_control/suite/quadruped.xml; task math
suite/quadruped.py:41-480). Each leg is hip(yaw+pitch) → knee → ankle with
a welded toe sphere (friction 1.5); joints carry the `body` class defaults
damping 30 / armature .01 (quadruped.xml:22-23). Capsule geoms use density
500, the torso ellipsoid density 1000 (quadruped.xml:21,122).

Actuation mirrors the reference's `<general>` servo set
(quadruped.xml:57-66,278-291): per leg a *yaw* servo on the hip-yaw joint
plus *lift*/*extend* servos acting through fixed tendons over
pitch/knee/ankle, each with gain 1000 and an affine bias −1000·length —
i.e. force = 1000·(act − L) — and first-order filter activation dynamics
(dyntype="filter" dynprm=".1"), integrated here per physics substep in
`task_aux["act"]`. Control ranges are the reference's asymmetric
ctrlranges (yaw ±1, lift −1..1.1, extend ±.8); the env's [-1,1] actions
are affinely mapped onto them (dmc2gym's action renormalization,
reference: src/env/dmc2gym/wrappers.py:134-141).

The reference's equality-constrained coupling tendons
(quadruped.xml:208-276) are approximated by stiff passive tendon springs
(`add_fixed_tendon_spring`) — same coupling geometry, penalty instead of
Lagrangian constraint.

Documented approximations:
  * escape: the per-episode procedural bowl heightfield
    (suite/quadruped.py:362-423) is real — generated in init_fn, contacted
    through sample-point spheres vs the bilinear surface, rangefinders
    ray-march it, and the renderer traces it (physics/hfield.py). The
    remaining approximations: scipy's spline zoom of the bump noise is
    jax.image.resize cubic, and contacts are smooth penalties (as
    everywhere in this engine), not MuJoCo's prism-decomposition LCP.
  * fetch: ball↔torso contact uses an invisible collision sphere instead
    of the torso ellipsoid (engine has no ellipsoid contact pair).
  * force/torque toe sensors report the contact normal-force magnitude on
    the site z axis (torque zero) rather than full MuJoCo wrench readout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import engine, hfield as hf, rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics, geom_world
from sgqn_carla_tpu.physics.math3d import quat_to_euler_xyz
from sgqn_carla_tpu.physics.model import (
    CAPSULE, CYLINDER, ELLIPSOID, HFIELD, HINGE, PLANE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import PhysState, Task

_DEFAULT_TIME_LIMIT = 20.0
_CONTROL_TIMESTEP = 0.02    # reference: quadruped.py:42
_RUN_SPEED = 5.0
_WALK_SPEED = 0.5
_D = np.deg2rad

_LEGS = ("front_left", "front_right", "back_right", "back_left")
_LEG_SIGNS = {"front_left": 45.0, "front_right": -45.0,
              "back_right": -135.0, "back_left": 135.0}
_J = dict(damping=30.0, armature=0.01, limited=True)
_FILTER_TAU = 0.1           # dynprm of the filter actuators
_SERVO_GAIN = 1000.0
_COUPLING_K = 1500.0        # penalty stand-in for the coupling equality

_TOE_OFF = np.array([0.0, 0.0, -0.3])  # toe body pos in ankle frame


def _capsule_mass(r, hl, density):
    return density * (np.pi * r * r * (2 * hl) + 4.0 / 3.0 * np.pi * r ** 3)


def make_model(floor_size=10.0, walls_and_ball=False, terrain=False):
    b = ModelBuilder(timestep=0.005, integrator="euler")
    b.add_geom(0, PLANE, size=(floor_size, floor_size, 0.5), material="grid",
               name="floor", friction=1.0, conaffinity=25, contype=25)
    if terrain:
        # procedural heightfield bowl (escape; quadruped.xml:13,84
        # `<hfield ncol=201 nrow=201 size="30 30 5 .1"/>`). The elevation
        # grid is per-episode state (physics/hfield.py), generated in
        # init_fn and threaded through step/render.
        b.add_geom(0, HFIELD,
                   size=(hf.TERRAIN_HALF, hf.TERRAIN_HALF, hf.TERRAIN_ZMAX,
                         0.1),
                   pos=(0, 0, hf.TERRAIN_Z0), rgba=(0.2, 0.3, 0.4, 1.0),
                   material="decoration", name="terrain", friction=1.0,
                   conaffinity=25, contype=25)
    if walls_and_ball:
        fs = 15.0
        for name, pos, zaxis in (
                ("wall_px", (-fs - 0.7, 0, 0.7), (1, 0, 1)),
                ("wall_py", (0, -fs - 0.7, 0.7), (0, 1, 1)),
                ("wall_nx", (fs + 0.7, 0, 0.7), (-1, 0, 1)),
                ("wall_ny", (0, fs + 0.7, 0.7), (0, -1, 1))):
            b.add_geom(0, PLANE, size=(fs, fs, 0.5), pos=pos, zaxis=zaxis,
                       material="decoration", name=name, contype=16,
                       conaffinity=16)
        # target site rendered as a flat cylinder at the origin
        # (quadruped.xml:82)
        b.add_geom(0, CYLINDER, size=(0.4, 0.06), pos=(0, 0, 0.05),
                   material="target", name="target", contype=0, conaffinity=0,
                   mass=0)

    torso = b.add_body(0, pos=(0, 0, 0.57), name="torso")
    b.add_free_root(torso)
    # contype bit 8 pairs the torso with the floor only: the engine has no
    # ellipsoid↔capsule narrow phase, so torso↔leg contact (marginal under
    # the reference joint limits) is excluded by construction
    b.add_geom(torso, ELLIPSOID, size=(0.3, 0.27, 0.2), material="self",
               name="torso", friction=1.0, contype=8, conaffinity=8)
    if walls_and_ball:
        # invisible stand-in for ball↔torso contact (no ellipsoid pairs)
        b.add_geom(torso, SPHERE, size=(0.25,), name="torso_coll",
                   group=4, rgba=(0, 0, 0, 0), contype=2, conaffinity=2,
                   mass=0, friction=1.0)
    # eyes (visual only)
    for side, s in (("r", -1), ("l", 1)):
        b.add_geom(torso, CYLINDER, size=(0.05,),
                   fromto=(0.1, s * 0.07, 0.12, 0.31, s * 0.07, 0.08),
                   material="self", name=f"eye_{side}", mass=0, contype=0,
                   conaffinity=0)
        b.add_geom(torso, SPHERE, size=(0.033,), pos=(0.3, s * 0.07, 0.08),
                   material="eye", name=f"pupil_{side}", mass=0, contype=0,
                   conaffinity=0, group=3)

    for leg in _LEGS:
        ang = _LEG_SIGNS[leg]
        px = 0.2 if leg.startswith("front") else -0.2
        py = 0.2 if leg.endswith("left") else -0.2
        hip = b.add_body(torso, pos=(px, py, 0), euler_deg=(0, 0, ang),
                         name=f"hip_{leg}")
        b.add_joint(hip, HINGE, axis=(0, 0, 1), range=(_D(-50), _D(50)),
                    name=f"yaw_{leg}", **_J)
        b.add_joint(hip, HINGE, axis=(0, 1, 0), range=(_D(-20), _D(60)),
                    name=f"pitch_{leg}", **_J)
        b.add_geom(hip, CAPSULE, size=(0.08,), fromto=(0, 0, 0, 0.3, 0, 0.11),
                   material="self", name=f"thigh_{leg}", friction=1.0,
                   mass=_capsule_mass(0.08, 0.1598, 500.0), contype=3,
                   conaffinity=3)
        knee = b.add_body(hip, pos=(0.3, 0, 0.11), name=f"knee_{leg}")
        b.add_joint(knee, HINGE, axis=(0, 1, 0), range=(_D(-60), _D(50)),
                    name=f"knee_{leg}", **_J)
        b.add_geom(knee, CAPSULE, size=(0.065,),
                   fromto=(0, 0, 0, 0.25, 0, -0.25), material="self",
                   name=f"shin_{leg}", friction=1.0,
                   mass=_capsule_mass(0.065, 0.1768, 500.0), contype=3,
                   conaffinity=3)
        ankle = b.add_body(knee, pos=(0.25, 0, -0.25), name=f"ankle_{leg}")
        b.add_joint(ankle, HINGE, axis=(0, 1, 0), range=(_D(-45), _D(55)),
                    name=f"ankle_{leg}", **_J)
        b.add_geom(ankle, CAPSULE, size=(0.055,),
                   fromto=(0, 0, 0, 0, 0, -0.25), material="self",
                   name=f"foot_{leg}", friction=1.0,
                   mass=_capsule_mass(0.055, 0.125, 500.0), contype=3,
                   conaffinity=3)
        # welded toe (toe body has no joints; geoms fold into the ankle)
        b.add_geom(ankle, SPHERE, size=(0.08,), pos=tuple(_TOE_OFF),
                   material="effector", name=f"toe_{leg}", friction=1.5,
                   mass=_capsule_mass(0.08, 0.0, 500.0) * 0 +
                   500.0 * 4.0 / 3.0 * np.pi * 0.08 ** 3, contype=3,
                   conaffinity=3)

    if walls_and_ball:
        ball = b.add_body(0, pos=(0, 0, 3.0), name="ball")
        b.add_free_root(ball, prefix="ball_root")
        b.add_geom(ball, SPHERE, size=(0.15,), material="effector",
                   name="ball", friction=0.7, contype=18, conaffinity=18)

    # actuators: reference order (yaw, lift, extend) × legs
    # (quadruped.xml:278-291)
    for leg in _LEGS:
        b.add_position_actuator([(f"yaw_{leg}", 1.0)], kp=_SERVO_GAIN,
                                ctrlrange=(-1.0, 1.0))
        b.add_position_actuator([(f"pitch_{leg}", 0.5), (f"ankle_{leg}", -0.5)],
                                kp=_SERVO_GAIN, ctrlrange=(-1.0, 1.1))
        b.add_position_actuator(
            [(f"pitch_{leg}", 0.25), (f"knee_{leg}", -0.5),
             (f"ankle_{leg}", 0.25)], kp=_SERVO_GAIN, ctrlrange=(-0.8, 0.8))
        # coupling equality → stiff penalty spring (quadruped.xml:208-276)
        b.add_fixed_tendon_spring(
            [(f"pitch_{leg}", 0.333), (f"knee_{leg}", 0.333),
             (f"ankle_{leg}", 0.333)], stiffness=_COUPLING_K)

    b.add_camera("global", pos=(-10, 10, 10),
                 xyaxes=(-1, -1, 0, 1, 0, 1), mode="trackcom", body=torso)
    b.add_camera("x", pos=(-1.7, 0, 1), xyaxes=(0, -1, 0, 0.75, 0, 1),
                 mode="trackcom", body=torso)
    return b.finalize()


def _hinge_dofs(model):
    return [model.joint_id(f"{k}_{leg}") for leg in _LEGS
            for k in ("yaw", "pitch", "knee", "ankle")]


def _toe_pair_rows(model):
    """Contact-pair indices of toe↔floor, one per leg (reference order)."""
    floor = next(i for i, g in enumerate(model.geoms) if g.name == "floor")
    rows = []
    for leg in _LEGS:
        toe = next(i for i, g in enumerate(model.geoms)
                   if g.name == f"toe_{leg}")
        for r, (i, j) in enumerate(np.asarray(model.contact_pairs)):
            if {int(i), int(j)} == {floor, toe}:
                rows.append(r)
                break
    return rows


def _lowest_point(model, qpos):
    """Analytic min-z over collidable geoms — the closed-form equivalent of
    the reference's iterative `_find_non_contacting_height`
    (suite/quadruped.py:253-282)."""
    kin = forward_kinematics(model, qpos, jnp.zeros_like(qpos))
    Rg, pg = geom_world(model, kin)
    lows = []
    for i, g in enumerate(model.geoms):
        if g.gtype == PLANE or not g.contype:
            continue
        if g.gtype == SPHERE:
            lows.append(pg[i, 2] - float(g.size[0]))
        elif g.gtype in (CAPSULE, CYLINDER):
            hl = float(g.size[1])
            lows.append(pg[i, 2] - jnp.abs(Rg[i, 2, 2]) * hl
                        - float(g.size[0]))
        elif g.gtype == ELLIPSOID:
            s = jnp.asarray(g.size, jnp.float32)
            lows.append(pg[i, 2] - jnp.sqrt(jnp.sum((Rg[i, 2] * s) ** 2)))
    return jnp.min(jnp.stack(lows))


def _map_ctrl(model, action):
    """[-1,1] env action → MuJoCo ctrlrange (dmc2gym renormalization)."""
    lo = jnp.asarray(model.act_ctrlrange[:, 0], jnp.float32)
    hi = jnp.asarray(model.act_ctrlrange[:, 1], jnp.float32)
    a = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
    return lo + (a + 1.0) * 0.5 * (hi - lo)


def _make_step_fn(torso_link, use_hfield=False):
    def step_fn(model, n_sub_steps, state, action):
        ctrl = _map_ctrl(model, action)
        aux = dict(state.task_aux)
        act = aux["act"]
        terrain = aux["terrain"] if use_hfield else None
        qpos, qvel, cf = state.qpos, state.qvel, state.contact_force
        dt = model.timestep
        for _ in range(n_sub_steps):
            # dyntype=filter: acṫ = (ctrl − act)/τ (exact exponential step)
            act = act + (ctrl - act) * (1.0 - jnp.exp(-dt / _FILTER_TAU))
            out = engine.n_steps(model, qpos, qvel, act, 1, hfield=terrain)
            qpos, qvel, cf = out.qpos, out.qvel, out.contact_force
        # finite-difference torso velocity for the accelerometer
        kin = forward_kinematics(model, qpos, qvel)
        v_now = kin.v[torso_link, 3:] + jnp.cross(
            kin.v[torso_link, :3], kin.p[torso_link])
        aux["accel_w"] = (v_now - aux["torso_v"]) / (dt * n_sub_steps)
        aux["torso_v"] = v_now
        aux["act"] = act
        return state.replace(qpos=qpos, qvel=qvel, contact_force=cf,
                             task_aux=aux)

    return step_fn


def _init_aux(model, extra=None):
    aux = {"act": jnp.zeros(model.nu, jnp.float32),
           "torso_v": jnp.zeros(3, jnp.float32),
           "accel_w": jnp.zeros(3, jnp.float32)}
    if extra:
        aux.update(extra)
    return aux


def _base_init(model, rng, xy_radius=0.0):
    """Random orientation + analytic non-contacting height."""
    k_q, k_xy = jax.random.split(rng)
    q = jax.random.normal(k_q, (4,), jnp.float32)
    q = q / jnp.linalg.norm(q)
    qpos = jnp.zeros(model.nv, jnp.float32)
    qpos = qpos.at[3:6].set(quat_to_euler_xyz(q))
    if xy_radius > 0:
        xy = jax.random.uniform(k_xy, (2,), jnp.float32, -xy_radius,
                                xy_radius)
        qpos = qpos.at[0:2].set(xy)
    low = _lowest_point(model, qpos)
    qpos = qpos.at[2].set(qpos[2] - low + 0.01)
    return qpos


def _common_obs(model, state, torso_link, hinge, toe_rows):
    kin = forward_kinematics(model, state.qpos, state.qvel)
    R = kin.R[torso_link]
    hinge_idx = jnp.asarray(hinge)
    ego = jnp.concatenate([state.qpos[hinge_idx], state.qvel[hinge_idx],
                           state.task_aux["act"]])
    # velocimeter: torso-frame linear velocity (quadruped.py:172-174)
    w = kin.v[torso_link, :3]
    v = kin.v[torso_link, 3:] + jnp.cross(w, kin.p[torso_link])
    torso_vel = R.T @ v
    upright = R[2, 2]
    gyro = R.T @ w
    g = jnp.asarray(model.gravity, jnp.float32)
    accel = R.T @ (state.task_aux["accel_w"] - g)
    # toe_rows: (4,) pair rows, or (4, m) rows summed per toe (escape sums
    # the floor-pair and terrain rows — MuJoCo's force sensor reads the
    # total contact wrench on the toe body regardless of surface)
    fn = state.contact_force[jnp.asarray(toe_rows)]
    if fn.ndim == 2:
        fn = fn.sum(-1)
    ft = jnp.concatenate([
        jnp.stack([jnp.zeros_like(fn), jnp.zeros_like(fn),
                   jnp.arcsinh(fn)], -1).reshape(-1),
        jnp.zeros(12, jnp.float32)])  # torque sensors
    return kin, {
        "egocentric_state": ego,
        "torso_velocity": torso_vel,
        "torso_upright": upright,
        "imu": jnp.concatenate([accel, gyro]),
        "force_torque": ft,
    }


def _upright_reward(upright, deviation_angle=0.0):
    deviation = float(np.cos(np.deg2rad(deviation_angle)))
    return rewards.tolerance(upright, bounds=(deviation, float("inf")),
                             sigmoid="linear", margin=1 + deviation,
                             value_at_margin=0.0)


def _make_move(desired_speed, floor_size):
    model = make_model(floor_size=floor_size)
    torso_link = model.joint_id("root_rz")
    hinge = _hinge_dofs(model)
    toe_rows = _toe_pair_rows(model)

    def init_fn(model, rng):
        return PhysState(_base_init(model, rng),
                         jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((len(model.contact_pairs),), jnp.float32),
                         task_aux=_init_aux(model))

    def observe_fn(model, state):
        _, obs = _common_obs(model, state, torso_link, hinge, toe_rows)
        return obs

    def reward_fn(model, state, kin, ctrl):
        R = kin.R[torso_link]
        w = kin.v[torso_link, :3]
        v = kin.v[torso_link, 3:] + jnp.cross(w, kin.p[torso_link])
        vx = (R.T @ v)[0]
        move = rewards.tolerance(vx, bounds=(desired_speed, float("inf")),
                                 margin=desired_speed, value_at_margin=0.5,
                                 sigmoid="linear")
        return _upright_reward(R[2, 2]) * move

    name = "quadruped_walk" if desired_speed == _WALK_SPEED else "quadruped_run"
    return Task(name=name, model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
                step_fn=_make_step_fn(torso_link))


# rangefinder ray directions/origins in the torso frame (the rf_* sites,
# quadruped.xml:101-120: rays fan from the snout toward the ground ahead)
_RF_FROM = np.array([[0.41, o, z] for z, zo in
                     ((0.11, 0.115), (0.10, 0.11), (0.09, 0.105),
                      (0.08, 0.10))
                     for o in (-0.02, -0.01, 0.0, 0.01, 0.02)])
_RF_TO = np.array([[0.34 + 0.02 * r, 0.0, 0.115 - 0.005 * r]
                   for r in range(4) for _ in range(5)])


def _make_escape():
    model = make_model(floor_size=40.0, terrain=True)
    torso_link = model.joint_id("root_rz")
    hinge = _hinge_dofs(model)
    npair = len(model.contact_pairs)
    # per-toe force rows: floor pair + terrain row (summed in _common_obs)
    floor_rows = _toe_pair_rows(model)
    toe_hrows = []
    for leg in _LEGS:
        toe = next(i for i, g in enumerate(model.geoms)
                   if g.name == f"toe_{leg}")
        h_i = next(k for k, (gid, _) in enumerate(model.hfield_pairs)
                   if gid == toe)
        toe_hrows.append(npair + h_i)
    toe_rows = np.stack([np.asarray(floor_rows), np.asarray(toe_hrows)], -1)
    # reward bound = hfield x half-extent, NOT the 40 m floor
    # (reference: quadruped.py:415 terrain_size = hfield_size[_ID, 0] = 30)
    terrain_size = hf.TERRAIN_HALF
    rf_dir = _RF_TO - _RF_FROM
    rf_dir = rf_dir / np.linalg.norm(rf_dir, axis=1, keepdims=True)
    n_cf = npair + len(model.hfield_pairs)

    def init_fn(model, rng):
        k_base, k_terrain = jax.random.split(rng)
        terrain = hf.generate_terrain(k_terrain)
        qpos = _base_init(model, rng=k_base)
        # spawn on the terrain surface at the origin (the reference raises
        # z until free of the heightfield, quadruped.py:253-282,400-404)
        h0, _ = hf.sample(terrain, qpos[0], qpos[1])
        qpos = qpos.at[2].add(h0)
        return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                         jnp.zeros((n_cf,), jnp.float32),
                         task_aux=_init_aux(model, {"terrain": terrain}))

    def observe_fn(model, state):
        kin, obs = _common_obs(model, state, torso_link, hinge, toe_rows)
        R, p = kin.R[torso_link], kin.p[torso_link]
        obs["origin"] = -(R.T @ p)
        # rangefinders: ray-march the terrain surface (physics/hfield.py);
        # tanh scaling per the reference Physics.rangefinder
        # (quadruped.py:206-211)
        o_w = p[None, :] + (R @ jnp.asarray(_RF_FROM.T, jnp.float32)).T
        d_w = (R @ jnp.asarray(rf_dir.T, jnp.float32)).T
        t, _, hit = hf.raycast(
            state.task_aux["terrain"],
            (o_w[:, 0], o_w[:, 1], o_w[:, 2]),
            (d_w[:, 0], d_w[:, 1], d_w[:, 2]), tmax=4.0)
        obs["rangefinder"] = jnp.where(hit, jnp.tanh(t), 1.0)
        return obs

    def reward_fn(model, state, kin, ctrl):
        R, p = kin.R[torso_link], kin.p[torso_link]
        # workspace site sits at (.8, 0, -.2) in the torso frame
        ws = p + R @ jnp.asarray([0.8, 0.0, -0.2], jnp.float32)
        escape = rewards.tolerance(jnp.linalg.norm(ws),
                                   bounds=(terrain_size, float("inf")),
                                   margin=terrain_size, value_at_margin=0.0,
                                   sigmoid="linear")
        return _upright_reward(R[2, 2], deviation_angle=20.0) * escape

    return Task(name="quadruped_escape", model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
                step_fn=_make_step_fn(torso_link, use_hfield=True))


def _make_fetch():
    model = make_model(floor_size=15.0, walls_and_ball=True)
    torso_link = model.joint_id("root_rz")
    ball_link = model.joint_id("ball_root_rz")
    ball_x = model.joint_id("ball_root_x")
    hinge = _hinge_dofs(model)
    toe_rows = _toe_pair_rows(model)
    spawn_radius = 0.9 * 15.0
    arena_radius = 15.0 * np.sqrt(2)
    workspace_radius, ball_radius, target_radius = 0.3, 0.15, 0.4

    def init_fn(model, rng):
        k_az, k_xy, k_b, k_bv = jax.random.split(rng, 4)
        azimuth = jax.random.uniform(k_az, (), jnp.float32, 0, 2 * np.pi)
        qpos = jnp.zeros(model.nv, jnp.float32)
        q = jnp.stack([jnp.cos(azimuth / 2), 0.0 * azimuth, 0.0 * azimuth,
                       jnp.sin(azimuth / 2)])
        qpos = qpos.at[3:6].set(quat_to_euler_xyz(q))
        xy = jax.random.uniform(k_xy, (2,), jnp.float32, -spawn_radius,
                                spawn_radius)
        qpos = qpos.at[0:2].set(xy)
        low = _lowest_point(model, qpos)
        qpos = qpos.at[2].set(qpos[2] - low + 0.01)
        bxy = jax.random.uniform(k_b, (2,), jnp.float32, -spawn_radius,
                                 spawn_radius)
        qpos = qpos.at[ball_x:ball_x + 2].set(bxy)
        qpos = qpos.at[ball_x + 2].set(2.0)
        qvel = jnp.zeros(model.nv, jnp.float32)
        qvel = qvel.at[ball_x:ball_x + 2].set(
            5.0 * jax.random.normal(k_bv, (2,), jnp.float32))
        return PhysState(qpos, qvel,
                         jnp.zeros((len(model.contact_pairs),), jnp.float32),
                         task_aux=_init_aux(model))

    def _ball_state(state, kin):
        R = kin.R[torso_link]
        rel_pos = kin.p[ball_link] - kin.p[torso_link]
        rel_vel = state.qvel[ball_x:ball_x + 3] - state.qvel[0:3]
        rot_vel = state.qvel[ball_x + 3:ball_x + 6]
        return jnp.concatenate([R.T @ rel_pos, R.T @ rel_vel,
                                R.T @ rot_vel])

    def observe_fn(model, state):
        kin, obs = _common_obs(model, state, torso_link, hinge, toe_rows)
        R, p = kin.R[torso_link], kin.p[torso_link]
        obs["ball_state"] = _ball_state(state, kin)
        obs["target_position"] = R.T @ (jnp.asarray(
            [0, 0, 0.05], jnp.float32) - p)
        return obs

    def reward_fn(model, state, kin, ctrl):
        R, p = kin.R[torso_link], kin.p[torso_link]
        ws = p + R @ jnp.asarray([0.8, 0.0, -0.2], jnp.float32)
        ball_p = kin.p[ball_link]
        reach = rewards.tolerance(
            jnp.linalg.norm((ws - ball_p)[:2]),
            bounds=(0, workspace_radius + ball_radius),
            sigmoid="linear", margin=arena_radius, value_at_margin=0.0)
        fetch = rewards.tolerance(
            jnp.linalg.norm(ball_p[:2]),
            bounds=(0, target_radius), sigmoid="linear",
            margin=arena_radius, value_at_margin=0.0)
        return _upright_reward(R[2, 2]) * reach * (0.5 + 0.5 * fetch)

    return Task(name="quadruped_fetch", model=model,
                n_sub_steps=int(round(_CONTROL_TIMESTEP / model.timestep)),
                init_fn=init_fn, observe_fn=observe_fn, reward_fn=reward_fn,
                camera_id=0, time_limit=_DEFAULT_TIME_LIMIT,
                step_fn=_make_step_fn(torso_link))


@register("quadruped", "walk")
def walk():
    return _make_move(_WALK_SPEED, floor_size=_DEFAULT_TIME_LIMIT * _WALK_SPEED)


@register("quadruped", "run")
def run():
    return _make_move(_RUN_SPEED, floor_size=_DEFAULT_TIME_LIMIT * _RUN_SPEED)


@register("quadruped", "escape")
def escape():
    return _make_escape()


@register("quadruped", "fetch")
def fetch():
    return _make_fetch()
