"""Interaction-level grasp/contact capability tests.

Trajectory goldens are too chaotic to catch capability gaps (a task can
track MuJoCo for 25 steps and still be unlearnable), so these assert the
*interactions* the tasks are built around, cross-checked against real
MuJoCo during development (see artifacts/finger_spin_drq_tpu and
docs/PERF.md):

- finger: a scripted rub must spin the spinner past the 15 rad/s sparse
  reward threshold (real-MuJoCo peak with the same script: 21.0);
- manipulator: a closed gripper must HOLD the squeezed ball against
  gravity (implicit contact stage — true stiction; real MuJoCo holds at
  z 0.913 from 0.945) and the grasp torque must NOT blow the digit
  joints through their ±range (implicit limit stage).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.domains import load


def test_finger_spin_reaches_reward_threshold():
    t = load("finger", "spin")
    m = t.model
    step = jax.jit(t.step)
    st = t.init(jax.random.PRNGKey(0))
    peak = 0.0
    hinge = m.joint_id("hinge")
    for i in range(300):
        st = step(st, jnp.array([0.5, 1.0 * np.sin(4.0 * i * 0.04)]))
        peak = max(peak, abs(float(st.qvel[hinge])))
    assert peak >= 15.0, f"scripted rub peaked at {peak} rad/s (<15: " \
        "the sparse spin reward would be unreachable)"


@pytest.fixture(scope="module")
def grasp_rollout():
    """Squeeze the ball between the gripper tips, full grasp ctrl, 200
    control steps (2 s)."""
    t = load("manipulator", "bring_ball")
    m = t.model
    jn = m.joint_names
    names = m.body_names
    qpos = np.zeros(m.nv)
    kin = engine.forward_kinematics(m, jnp.asarray(qpos, jnp.float32),
                                    jnp.zeros(m.nv, jnp.float32))
    tt = np.asarray(kin.p[m.body_last_link[names.index("thumbtip")]])
    ft = np.asarray(kin.p[m.body_last_link[names.index("fingertip")]])
    mid = (tt + ft) / 2
    qpos[jn.index("object_x")] = mid[0]
    qpos[jn.index("object_z")] = mid[2]
    st = t.init(jax.random.PRNGKey(0)).replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.zeros(m.nv, jnp.float32))
    step = jax.jit(t.step)
    ctrl = jnp.zeros(t.action_size).at[4].set(1.0)
    traj = []
    for _ in range(200):
        st = step(st, ctrl)
        traj.append(np.asarray(st.qpos))
    return t, np.stack(traj)


def test_gripper_holds_ball(grasp_rollout):
    t, traj = grasp_rollout
    z = traj[:, t.model.joint_id("object_z")]
    assert np.isfinite(traj).all()
    # held near the grip height (mj: 0.913 from 0.945) for the full 2 s;
    # an explicit penalty drops it to the floor (0.022) within 0.5 s
    assert z[-1] > 0.8, f"ball fell to z={z[-1]:.3f} — grasp cannot hold"


def test_solver_warm_carry_populated_and_helps(grasp_rollout):
    """The implicit solver's warm-start carry (PhysState.solver_warm):
    Task.step must thread a live λ array (positive normal impulses while
    the ball is squeezed), and warm-threading across control steps must
    hold the ball at least as high as cold-starting the solver every
    control step (the cold path rebuilds λ through fresh micro-slip each
    substep, which accumulates as hold creep)."""
    from sgqn_carla_tpu.physics import dense

    t, traj = grasp_rollout
    m = t.model
    jn = m.joint_names
    qpos = np.zeros(m.nv)
    qpos[jn.index("object_x")] = traj[0, jn.index("object_x")]
    qpos[jn.index("object_z")] = traj[0, jn.index("object_z")]
    st0 = t.init(jax.random.PRNGKey(0)).replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.zeros(m.nv, jnp.float32))
    assert st0.solver_warm is not None
    assert st0.solver_warm.shape == (dense.warm_size(m), 3)

    step = jax.jit(t.step)
    ctrl = jnp.zeros(t.action_size).at[4].set(1.0)
    st_warm = st0
    st_cold = st0
    for _ in range(40):
        st_warm = step(st_warm, ctrl)
        # cold: discard the carry so every control step rebuilds λ
        st_cold = step(st_cold, ctrl).replace(
            solver_warm=jnp.zeros_like(st0.solver_warm))
    lam_n = np.asarray(st_warm.solver_warm[:, 0])
    assert lam_n.max() > 0.0, "no positive normal impulse in the carry"
    zi = m.joint_id("object_z")
    z_warm = float(st_warm.qpos[zi])
    z_cold = float(st_cold.qpos[zi])
    assert z_warm >= z_cold - 1e-3, (
        f"warm-threaded hold ({z_warm:.3f}) worse than cold ({z_cold:.3f})")


def test_receptacle_immobile_under_contact_load():
    """The insert-task receptacle rides on 1e6-damped "pose dofs" standing
    in for MuJoCo's per-episode body_pos mutation (manipulator.py module
    docstring: contact loads of ~10 N must drift it < 0.1 mm over 10 s).
    The implicit contact solver must honor that: impulses go through the
    damping-implicit inverse inertia (M + h·diag(d)), or each substep's
    impulse gives the receptacle a velocity that damping only kills AFTER
    position integration — a sustained resting ball then drifts the cup
    ~1000× its budget."""
    t = load("manipulator", "insert_ball")
    m = t.model
    jn = m.joint_names
    st = t.init(jax.random.PRNGKey(3))
    qpos = np.asarray(st.qpos).copy()
    # upright cup at a known pose; ball seated at its resting depth inside
    # (cup V-bottom is 0.04 below the rec origin, capsule r 0.008, ball
    # r 0.022) so contact is sustained from the first substep
    qpos[jn.index("rec_x")] = 0.0
    qpos[jn.index("rec_z")] = 0.3
    qpos[jn.index("rec_y")] = 0.0
    qpos[jn.index("object_x")] = 0.0
    qpos[jn.index("object_z")] = 0.3 - 0.04 + 0.008 + 0.022
    qpos[jn.index("object_y")] = 0.0
    st = st.replace(qpos=jnp.asarray(qpos, jnp.float32),
                    qvel=jnp.zeros(m.nv, jnp.float32))
    rec0 = qpos[[jn.index("rec_x"), jn.index("rec_z"), jn.index("rec_y")]]
    cup_rows = [r for r, (i, j) in enumerate(np.asarray(m.contact_pairs))
                if "cup" in m.geoms[i].name + m.geoms[j].name
                and "ball" in m.geoms[i].name + m.geoms[j].name]
    step = jax.jit(t.step)
    ctrl = jnp.zeros(t.action_size)
    touched = 0.0
    for _ in range(100):          # 1 s of resting contact load
        st = step(st, ctrl)
        touched = max(touched,
                      float(np.asarray(st.contact_force)[cup_rows].max()))
    q = np.asarray(st.qpos)
    assert np.isfinite(q).all()
    assert touched > 0.0, "ball never loaded the cup — test setup is vacuous"
    rec = q[[jn.index("rec_x"), jn.index("rec_z"), jn.index("rec_y")]]
    drift = np.abs(rec - rec0).max()
    assert drift < 5e-4, (
        f"receptacle pose dofs drifted {drift:.2e} under a resting ball "
        "(budget < 1e-5/s: contact impulses must see the 1e6 dof damping)")


def test_grasp_respects_digit_limits(grasp_rollout):
    t, traj = grasp_rollout
    m = t.model
    for name in ("thumb", "finger"):
        q = traj[:, m.joint_id(name)]
        hi = float(m.jnt_range[m.joint_id(name), 1])
        assert q.max() < hi + 0.08, (
            f"{name} blew through its upper limit: {q.max():.3f} > {hi:.3f}")
