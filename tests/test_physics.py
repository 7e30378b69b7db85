"""Physics engine tests: kinematics, dynamics sanity, contacts, domains.

Strategy follows the reference's suite-wide property harness (reference:
src/env/dm_control/dm_control/suite/tests/domains_test.py — spec conformance,
determinism given a seed, validity of obs/reward) plus analytic golden checks
(pendulum period, energy, resting contact) that a wrong dynamics
implementation cannot pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.domains import available, load
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, HINGE, PLANE, SLIDE, SPHERE, ModelBuilder,
)
from sgqn_carla_tpu.physics.task import PhysState


def _simple_pendulum(length=1.0, mass=1.0):
    """Point-ish mass on a hinge: analytic small-angle period 2π√(L/g)."""
    b = ModelBuilder(timestep=0.001)
    body = b.add_body(0, pos=(0, 0, 2.0), name="bob")
    b.add_joint(body, HINGE, axis=(0, 1, 0), name="swing")
    b.add_geom(body, SPHERE, size=(0.01,), pos=(0, 0, -length), mass=mass,
               contype=0, conaffinity=0)
    return b.finalize()


class TestPendulum:
    def test_small_angle_period(self):
        model = _simple_pendulum()
        L_eff = 1.0
        expected_T = 2 * np.pi * np.sqrt(L_eff / 9.81)
        q = jnp.array([0.05], jnp.float32)
        qd = jnp.zeros(1, jnp.float32)
        ctrl = jnp.zeros(0, jnp.float32)

        step = jax.jit(lambda q, qd: engine.step(model, q, qd, ctrl))
        # integrate one expected period; pendulum should return near start
        n = int(expected_T / model.timestep)
        for _ in range(n):
            q, qd, _ = step(q, qd)
        assert abs(float(q[0]) - 0.05) < 0.005

    def test_energy_conservation(self):
        model = _simple_pendulum()
        q = jnp.array([1.0], jnp.float32)
        qd = jnp.zeros(1, jnp.float32)
        ctrl = jnp.zeros(0, jnp.float32)

        def energy(q, qd):
            kin = engine.forward_kinematics(model, q, qd)
            M = engine.mass_matrix(model, kin)
            ke = 0.5 * qd @ M @ qd
            pe = 9.81 * float(model.link_mass[0]) * kin.com[0][2]
            return float(ke + pe)

        e0 = energy(q, qd)
        step = jax.jit(lambda q, qd: engine.step(model, q, qd, ctrl))
        for _ in range(2000):
            q, qd, _ = step(q, qd)
        e1 = energy(q, qd)
        assert abs(e1 - e0) / abs(e0) < 0.02

    def test_gravity_direction(self):
        """A pendulum displaced +x should accelerate back toward -θ."""
        model = _simple_pendulum()
        q = jnp.array([0.3], jnp.float32)
        qd = jnp.zeros(1, jnp.float32)
        out = engine.step(model, q, qd, jnp.zeros(0, jnp.float32))
        assert float(out.qvel[0]) < 0


class TestContacts:
    def _ball_on_floor(self):
        b = ModelBuilder(timestep=0.002)
        b.add_geom(0, PLANE, size=(10, 10, 1), contype=1, conaffinity=1)
        ball = b.add_body(0, pos=(0, 0, 1.0), name="ball")
        b.add_joint(ball, SLIDE, axis=(0, 0, 1), name="drop")
        b.add_geom(ball, SPHERE, size=(0.1,), mass=1.0, contype=1, conaffinity=0)
        return b.finalize()

    def test_ball_falls_and_rests(self):
        model = self._ball_on_floor()
        q = jnp.zeros(1, jnp.float32)
        qd = jnp.zeros(1, jnp.float32)
        ctrl = jnp.zeros(0, jnp.float32)
        step = jax.jit(lambda q, qd: engine.step(model, q, qd, ctrl))
        for _ in range(3000):
            q, qd, cf = step(q, qd)
        # resting: ball center ≈ floor + radius (small penetration allowed)
        height = 1.0 + float(q[0])
        assert 0.08 < height < 0.105
        assert abs(float(qd[0])) < 0.05
        # contact force ≈ weight
        assert abs(float(cf[0]) - 9.81) < 2.0

    def test_no_force_without_penetration(self):
        model = self._ball_on_floor()
        out = engine.step(model, jnp.zeros(1), jnp.zeros(1), jnp.zeros(0))
        assert float(out.contact_force[0]) == 0.0


class TestDomains:
    def test_registry(self):
        names = available()
        assert ("walker", "walk") in names
        assert ("cartpole", "swingup") in names

    @pytest.mark.parametrize("domain,task", [("cartpole", "swingup"),
                                             ("walker", "walk")])
    def test_episode_runs(self, domain, task):
        t = load(domain, task)
        state = t.init(jax.random.PRNGKey(0))
        step = jax.jit(lambda s, c: t.step(s, c))
        ctrl = jnp.zeros(t.action_size, jnp.float32)
        for _ in range(20):
            state = step(state, ctrl)
        r = t.reward(state, ctrl)
        assert 0.0 <= float(r) <= 1.0
        assert np.isfinite(np.asarray(state.qpos)).all()
        assert np.isfinite(np.asarray(state.qvel)).all()

    def test_determinism(self):
        t = load("walker", "walk")
        step = jax.jit(lambda s, c: t.step(s, c))
        runs = []
        for _ in range(2):
            state = t.init(jax.random.PRNGKey(42))
            ctrl = jnp.ones(t.action_size, jnp.float32) * 0.3
            for _ in range(10):
                state = step(state, ctrl)
            runs.append(np.asarray(state.qpos))
        np.testing.assert_array_equal(runs[0], runs[1])

    def test_seed_changes_init(self):
        t = load("walker", "walk")
        s1 = t.init(jax.random.PRNGKey(1))
        s2 = t.init(jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(s1.qpos), np.asarray(s2.qpos))

    def test_walker_does_not_explode(self):
        """Walker dropped with zero actions must settle, not blow up."""
        t = load("walker", "stand")
        state = t.init(jax.random.PRNGKey(3))
        step = jax.jit(lambda s: t.step(s, jnp.zeros(t.action_size)))
        for _ in range(100):  # 2.5 simulated seconds
            state = step(state)
        assert np.isfinite(np.asarray(state.qpos)).all()
        assert np.abs(np.asarray(state.qvel)).max() < 50.0
        # torso must have fallen under gravity but stay above the floor plane
        kin = engine.forward_kinematics(t.model, state.qpos, state.qvel)
        torso_z = float(kin.p[2][2])
        assert -0.2 < torso_z < 1.31

    def test_walker_stand_reward_at_stand(self):
        """At the canonical standing pose the stand reward must be ≈ 1."""
        t = load("walker", "stand")
        state = t.init(jax.random.PRNGKey(0))
        state = state.replace(qpos=jnp.zeros(t.model.nv),
                              qvel=jnp.zeros(t.model.nv))
        r = float(t.reward(state, jnp.zeros(t.action_size)))
        assert r > 0.95

    def test_cartpole_balance_reward_profile(self):
        t = load("cartpole", "balance")
        # upright, centered, still → reward ≈ 1
        s = PhysState(jnp.zeros(2), jnp.zeros(2),
                      jnp.zeros(len(t.model.contact_pairs)))
        r_up = float(t.reward(s, jnp.zeros(1)))
        assert r_up > 0.95
        # hanging down → much lower
        s2 = s.replace(qpos=jnp.array([0.0, np.pi]))
        r_down = float(t.reward(s2, jnp.zeros(1)))
        assert r_down < 0.2

    def test_vmap_batch(self):
        t = load("cartpole", "swingup")
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        states = jax.vmap(t.init)(keys)
        ctrls = jnp.zeros((16, 1), jnp.float32)
        stepped = jax.jit(jax.vmap(t.step))(states, ctrls)
        assert stepped.qpos.shape == (16, 2)
        rewards_b = jax.vmap(t.reward)(stepped, ctrls)
        assert rewards_b.shape == (16,)

    def test_observation_shapes(self):
        t = load("walker", "walk")
        state = t.init(jax.random.PRNGKey(0))
        obs = t.observe(state)
        assert obs["orientations"].shape == (14,)
        assert obs["velocity"].shape == (9,)


def test_engine_dots_pinned_to_f32_precision():
    """Every dot_general traced from an engine entry point must carry
    Precision.HIGHEST: the TPU MXU otherwise default-lowers f32 dots to
    bf16, which NaN'd the fish free-root fluid dynamics within ~20
    random-action control steps (engine.f32_matmuls, docs/PERF.md "TPU
    matmul precision"). Fish exercises the dense path (nl >= DENSE_NL),
    the only emitter of dots."""
    t = load("fish", "upright")
    st = t.init(jax.random.PRNGKey(0))
    from sgqn_carla_tpu.physics import engine

    jaxpr = jax.make_jaxpr(lambda q, v, u: engine.step(t.model, q, v, u))(
        st.qpos, st.qvel, jnp.zeros(t.model.nu, jnp.float32))
    seen = set()

    def walk(jx):
        for eq in jx.eqns:
            if eq.primitive.name == "dot_general":
                seen.add(str(eq.params.get("precision")))
            for sub in eq.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                if isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)

    walk(jaxpr.jaxpr)
    assert seen, "fish engine.step emitted no dots — dense path not used?"
    assert seen == {"(Precision.HIGHEST, Precision.HIGHEST)"}, seen
