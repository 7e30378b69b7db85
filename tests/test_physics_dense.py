"""Dense (matmul) dynamics path — parity with the scalar-SoA path and
compile-time coverage of the large models the scalar path can't build
(swimmer15 et al.; see physics/dense.py).

The two paths implement the same Featherstone CRBA/RNEA + penalty
contacts, so qacc must agree to float32 tolerances on every domain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.physics import dense, engine
from sgqn_carla_tpu.physics.domains import load


def _qacc_both(model, qpos, qvel, ctrl):
    anc = engine._ancestors(model)
    a_soa, pf_soa = engine._forward_dynamics(model, qpos, qvel, ctrl, anc)
    a_den, pf_den = dense.forward_dynamics(model, qpos, qvel, ctrl, anc)
    return a_soa, a_den, pf_soa, pf_den


@pytest.mark.parametrize("domain,task", [
    ("walker", "walk"),          # contacts + limits
    ("cheetah", "run"),          # contacts, long chain
    ("ball_in_cup", "catch"),    # spatial tendon
    ("fish", "swim"),            # fluid (viscosity) + position actuators
    ("swimmer", "swimmer6"),     # fluid (density), planar root
])
def test_dense_matches_scalar(domain, task):
    t = load(domain, task)
    model = t.model
    rng = np.random.RandomState(3)
    both = jax.jit(lambda q, qd, c: _qacc_both(model, q, qd, c))
    for trial in range(3):
        qpos = jnp.asarray(rng.uniform(-0.3, 0.3, model.nv), jnp.float32)
        qvel = jnp.asarray(rng.uniform(-1.0, 1.0, model.nv), jnp.float32)
        ctrl = jnp.asarray(rng.uniform(-1.0, 1.0, model.nu), jnp.float32)
        a_soa, a_den, pf_soa, pf_den = both(qpos, qvel, ctrl)
        # tolerance scales with |qacc|: both paths do float32 SPD solves on
        # matrices with condition up to ~1e6 (fish fins: 1e-6 armature)
        scale = np.maximum(1.0, np.abs(np.asarray(a_soa)).max())
        np.testing.assert_allclose(
            np.asarray(a_den), np.asarray(a_soa), rtol=2e-3,
            atol=5e-3 * scale,
            err_msg=f"{domain}/{task} trial {trial}")
        np.testing.assert_allclose(np.asarray(pf_den), np.asarray(pf_soa),
                                   rtol=2e-3, atol=1e-2)


def test_dense_mass_matrix_matches_scalar():
    t = load("walker", "walk")
    model = t.model
    qpos = jnp.asarray(np.random.RandomState(0).uniform(-0.2, 0.2, model.nv),
                       jnp.float32)
    qvel = jnp.zeros(model.nv, jnp.float32)
    kin = engine.forward_kinematics(model, qpos, qvel)
    anc_f = jnp.asarray(engine._ancestors(model), jnp.float32)
    I6 = dense.spatial_inertias(model, kin)
    M_d = np.asarray(dense.mass_matrix(model, kin, I6, anc_f))
    M_s = np.asarray(engine.mass_matrix(model, kin))
    np.testing.assert_allclose(M_d, M_s, rtol=1e-4, atol=1e-5)
    # SPD sanity
    assert np.linalg.eigvalsh(M_d).min() > 0


def test_dense_bias_matches_scalar():
    t = load("cheetah", "run")
    model = t.model
    rng = np.random.RandomState(1)
    qpos = jnp.asarray(rng.uniform(-0.2, 0.2, model.nv), jnp.float32)
    qvel = jnp.asarray(rng.uniform(-1, 1, model.nv), jnp.float32)
    kin = engine.forward_kinematics(model, qpos, qvel)
    anc_f = jnp.asarray(engine._ancestors(model), jnp.float32)
    I6 = dense.spatial_inertias(model, kin)
    C_d = np.asarray(dense.bias_forces(model, kin, I6, qvel, anc_f))
    C_s = np.asarray(engine.bias_forces(model, kin, qvel))
    np.testing.assert_allclose(C_d, C_s, rtol=1e-3, atol=1e-3)


def test_swimmer15_compiles_and_rolls_out():
    """17 links — scalar-path compile took >10 min; dense must be usable."""
    t = load("swimmer", "swimmer15")
    assert t.model.nl >= dense.DENSE_NL  # dense path engaged
    rng = jax.random.PRNGKey(0)
    state = t.init(rng)
    step = jax.jit(t.step)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        ctrl = jax.random.uniform(k, (t.action_size,), minval=-1.0,
                                  maxval=1.0)
        state = step(state, ctrl)
        r = float(jax.jit(t.reward)(state, ctrl))
        assert 0.0 <= r <= 1.0
    assert np.isfinite(np.asarray(state.qpos)).all()
    assert np.abs(np.asarray(state.qvel)).max() < 200.0


def test_dense_vmap_batch():
    """Dense path vmaps over an env batch like the scalar path."""
    t = load("swimmer", "swimmer6")
    model = t.model
    anc = engine._ancestors(model)
    B = 4
    rng = np.random.RandomState(2)
    qpos = jnp.asarray(rng.uniform(-0.2, 0.2, (B, model.nv)), jnp.float32)
    qvel = jnp.asarray(rng.uniform(-1, 1, (B, model.nv)), jnp.float32)
    ctrl = jnp.asarray(rng.uniform(-1, 1, (B, model.nu)), jnp.float32)
    f = jax.vmap(lambda q, qd, c: dense.forward_dynamics(model, q, qd, c,
                                                         anc)[0])
    out = np.asarray(jax.jit(f)(qpos, qvel, ctrl))
    assert out.shape == (B, model.nv)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------- box/ellipsoid
# narrow-phase regression: the point-sample box contacts (corner-face
# manifolds) and ellipsoid-plane support contacts added for the
# manipulator/stacker/quadruped/humanoid_CMU domains.

def _settle(m, qpos, steps=12, n=50):
    qvel = jnp.zeros(m.nv, jnp.float32)
    step = jax.jit(lambda q, v: engine.n_steps(m, q, v, jnp.zeros(m.nu), n))
    for _ in range(steps):
        out = step(qpos, qvel)
        qpos, qvel = out.qpos, out.qvel
    return np.asarray(qpos), np.asarray(qvel)


def test_sphere_rests_on_box():
    from sgqn_carla_tpu.physics.model import BOX, PLANE, SPHERE, ModelBuilder

    b = ModelBuilder(timestep=0.002)
    b.add_geom(0, PLANE, size=(5, 5, 0.1), name="floor")
    b.add_geom(0, BOX, size=(0.5, 0.5, 0.25), pos=(0, 0, 0.25), name="table")
    ball = b.add_body(0, pos=(0.1, 0.1, 1.2), name="ball")
    b.add_free_root(ball)
    b.add_geom(ball, SPHERE, size=(0.1,), name="ball")
    m = b.finalize()
    q, v = _settle(m, jnp.zeros(m.nv, jnp.float32))
    # ball center z = body pos z (1.2) + root z offset; rests at box top + r
    assert abs((q[2] + 1.2) - 0.6) < 0.02
    assert np.isfinite(v).all()


def test_box_stacks_on_box():
    from sgqn_carla_tpu.physics.model import BOX, PLANE, ModelBuilder

    b = ModelBuilder(timestep=0.002)
    b.add_geom(0, PLANE, size=(5, 5, 0.1), name="floor")
    base = b.add_body(0, pos=(0, 0, 0.1), name="base")
    b.add_free_root(base)
    b.add_geom(base, BOX, size=(0.2, 0.2, 0.1), name="base")
    top = b.add_body(0, pos=(0.05, 0.0, 0.35), name="top")
    b.add_free_root(top, prefix="top_root")
    b.add_geom(top, BOX, size=(0.1, 0.1, 0.1), name="top")
    m = b.finalize()
    q, v = _settle(m, jnp.zeros(m.nv, jnp.float32), steps=20)
    top_z = q[m.joint_id("top_root_z")] + 0.35
    assert 0.27 < top_z < 0.32          # rests on the base box (~0.3)
    assert abs(q[m.joint_id("top_root_rx")]) < 0.05  # no tipping
    assert abs(q[m.joint_id("top_root_ry")]) < 0.05


def test_ellipsoid_rests_on_plane():
    from sgqn_carla_tpu.physics.model import ELLIPSOID, PLANE, ModelBuilder

    b = ModelBuilder(timestep=0.002)
    b.add_geom(0, PLANE, size=(5, 5, 0.1), name="floor")
    egg = b.add_body(0, pos=(0, 0, 0.6), name="egg")
    b.add_free_root(egg)
    b.add_geom(egg, ELLIPSOID, size=(0.3, 0.2, 0.1), name="egg")
    m = b.finalize()
    q, v = _settle(m, jnp.zeros(m.nv, jnp.float32))
    # flat orientation: rests on the z semi-axis (0.1)
    assert abs((q[2] + 0.6) - 0.1) < 0.02
