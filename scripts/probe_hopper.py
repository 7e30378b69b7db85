"""Interaction-level hopper probes: this engine vs the real MuJoCo wheel.

Round-2 item #3 (VERDICT): hopper-stand DrQ is flat and the finger-spin
episode proved golden-trajectory parity can coexist with an *unlearnable*
contact transfer (artifacts/finger_spin_drq_tpu — the fix there was a
stiffer per-domain contact_solref). These probes test the same failure
mode for hopper's foot↔floor interaction (reference model:
src/env/dm_control/dm_control/suite/hopper.xml):

  settle — drop from qpos=0, zero ctrl: steady standing height, touch
           force at rest (weight transfer), max penetration depth.
  jump   — crouch pose (foot on floor), full extension torque bursts for
           several candidate sign patterns: best jump height + peak
           vertical velocity per engine (toe-off impulse transfer).
  slip   — settled stance given qvel[rootx]=1.5, zero ctrl: horizontal
           displacement after 1 s (friction transfer).

Run on CPU:  python scripts/probe_hopper.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FOOT_R = 0.04
N_SUB = 4  # control step = 4 x 5 ms


# --------------------------------------------------------------- real MuJoCo
def real_rollout(qpos0, qvel0, ctrls):
    """Returns dict of per-control-step arrays from the public wheel."""
    from dm_control import suite

    env = suite.load("hopper", "stand", task_kwargs={"random": 0})
    env.reset()
    phys = env.physics
    with phys.reset_context():
        phys.data.qpos[:] = qpos0
        phys.data.qvel[:] = qvel0
    rootz, vz, rootx, touch, foot_bot = [], [], [], [], []
    for c in ctrls:
        phys.set_control(np.asarray(c, np.float64))
        phys.step(N_SUB)
        rootz.append(float(phys.data.qpos[1]))
        rootx.append(float(phys.data.qpos[0]))
        vz.append(float(phys.data.qvel[1]))
        touch.append(float(np.sum(phys.named.data.sensordata["touch_toe"]) +
                           np.sum(phys.named.data.sensordata["touch_heel"])))
        foot_bot.append(float(phys.named.data.geom_xpos["foot"][2]) - FOOT_R)
    return {k: np.array(v) for k, v in
            dict(rootz=rootz, vz=vz, rootx=rootx, touch=touch,
                 foot_bot=foot_bot).items()}


def real_foot_bottom(qpos0):
    from dm_control import suite

    env = suite.load("hopper", "stand", task_kwargs={"random": 0})
    env.reset()
    phys = env.physics
    with phys.reset_context():
        phys.data.qpos[:] = qpos0
    return float(phys.named.data.geom_xpos["foot"][2]) - FOOT_R


# ---------------------------------------------------------------- our engine
def ours_rollout(qpos0, qvel0, ctrls):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sgqn_carla_tpu.physics import domains

    task = domains.load("hopper", "stand")
    model = task.model
    npair = len(model.contact_pairs)
    foot_geom = next(i for i, g in enumerate(model.geoms)
                     if g.name == "foot")
    foot_pairs = np.array([foot_geom in (int(i), int(j))
                           for (i, j) in model.contact_pairs])

    state = task.init(jax.random.PRNGKey(0)).replace(
        qpos=jnp.asarray(qpos0, jnp.float32),
        qvel=jnp.asarray(qvel0, jnp.float32),
        contact_force=jnp.zeros((npair,), jnp.float32))
    step = jax.jit(task.step)

    from sgqn_carla_tpu.physics.engine import forward_kinematics, geom_world

    @jax.jit
    def foot_z(s):
        kin = forward_kinematics(model, s.qpos, s.qvel)
        _, pg = geom_world(model, kin)
        return pg[foot_geom][2]

    rootz, vz, rootx, touch, foot_bot = [], [], [], [], []
    for c in ctrls:
        state = step(state, jnp.asarray(c, jnp.float32))
        rootz.append(float(state.qpos[1]))
        rootx.append(float(state.qpos[0]))
        vz.append(float(state.qvel[1]))
        touch.append(float(jnp.sum(
            state.contact_force * jnp.asarray(foot_pairs, jnp.float32))))
        foot_bot.append(float(foot_z(state)) - FOOT_R)
    return {k: np.array(v) for k, v in
            dict(rootz=rootz, vz=vz, rootx=rootx, touch=touch,
                 foot_bot=foot_bot).items()}


def ours_foot_bottom(qpos0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sgqn_carla_tpu.physics import domains
    from sgqn_carla_tpu.physics.engine import forward_kinematics, geom_world

    task = domains.load("hopper", "stand")
    model = task.model
    foot_geom = next(i for i, g in enumerate(model.geoms)
                     if g.name == "foot")
    kin = forward_kinematics(model, jnp.asarray(qpos0, jnp.float32),
                             jnp.zeros(model.nv, jnp.float32))
    _, pg = geom_world(model, kin)
    return float(pg[foot_geom][2]) - FOOT_R


# -------------------------------------------------------------------- probes
def crouch_qpos():
    """Crouched pose: hip/knee folded, rootz chosen so the foot bottom
    touches the floor exactly (computed with the REAL engine's FK and
    applied identically to both sides)."""
    q = np.zeros(7)
    q[4] = np.deg2rad(-60.0)   # hip
    q[5] = np.deg2rad(120.0)   # knee
    q[6] = np.deg2rad(-20.0)   # ankle
    bot = real_foot_bottom(q)
    q[1] = -bot + 1e-4
    return q


def main():
    zero7 = np.zeros(7)
    results = {}

    # ------------------------------------------------------------- settle
    ctrls = np.zeros((60, 4))
    r = real_rollout(zero7, zero7, ctrls)
    o = ours_rollout(zero7, zero7, ctrls)
    results["settle"] = {
        "final_rootz": {"real": float(r["rootz"][-1]),
                        "ours": float(o["rootz"][-1])},
        "rest_touch_force": {"real": float(np.mean(r["touch"][-10:])),
                             "ours": float(np.mean(o["touch"][-10:]))},
        "max_penetration": {"real": float(-min(0.0, r["foot_bot"].min())),
                            "ours": float(-min(0.0, o["foot_bot"].min()))},
    }

    # --------------------------------------------------------------- jump
    q0 = crouch_qpos()
    # ours may disagree on FK by a hair; report both feet gaps for honesty
    results["crouch_foot_gap"] = {"real": real_foot_bottom(q0),
                                  "ours": ours_foot_bottom(q0)}
    patterns = [
        ("extend_hk", [0, 1, -1, 0]),
        ("extend_hka", [0, 1, -1, -1]),
        ("extend_hka+", [0, 1, -1, 1]),
        ("all_pos", [1, 1, 1, 1]),
        ("all_neg", [-1, -1, -1, -1]),
        ("knee_only", [0, 0, -1, 0]),
    ]
    T_burst, T_flight = 15, 45  # 0.3 s burst + 0.9 s flight
    jump = {}
    for name, vec in patterns:
        ctrls = np.concatenate([np.tile(vec, (T_burst, 1)),
                                np.zeros((T_flight, 4))])
        r = real_rollout(q0, zero7, ctrls)
        o = ours_rollout(q0, zero7, ctrls)
        jump[name] = {
            "max_rootz": {"real": float(r["rootz"].max()),
                          "ours": float(o["rootz"].max())},
            "peak_vz": {"real": float(r["vz"].max()),
                        "ours": float(o["vz"].max())},
        }
    results["jump"] = jump
    results["jump_start_rootz"] = float(q0[1])

    # --------------------------------------------------------------- slip
    # settled stance from the real engine's settle endpoint, same for both
    ctrls = np.zeros((60, 4))
    r_settle = real_rollout(zero7, zero7, ctrls)
    qs = np.zeros(7)
    qs[1] = r_settle["rootz"][-1]
    qv = np.zeros(7)
    qv[0] = 1.5
    ctrls = np.zeros((50, 4))
    r = real_rollout(qs, qv, ctrls)
    o = ours_rollout(qs, qv, ctrls)
    results["slip"] = {
        "displacement_1s": {"real": float(r["rootx"][-1]),
                            "ours": float(o["rootx"][-1])},
        "final_vx": {"real": float(r["rootx"][-1] - r["rootx"][-2]) / 0.02,
                     "ours": float(o["rootx"][-1] - o["rootx"][-2]) / 0.02},
    }

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
