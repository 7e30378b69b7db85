"""Composer layer: namespaced multi-instance attachment, scoped
observables, per-entity randomization, and full-stack compatibility of
the composed Task (modeled on the reference's composer tests:
src/env/dm_control/dm_control/composer/entity_test.py and
environment_test.py, re-expressed over the functional Task)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.physics.domains import available, load
from sgqn_carla_tpu.physics.domains.composed import Pendulum
from sgqn_carla_tpu.physics.composer import Arena, ComposerTask


@pytest.fixture(scope="module")
def task():
    return load("composer_demo", "pendula")


def test_registered(task):
    assert ("composer_demo", "pendula") in available()
    assert task.action_size == 2  # one actuator per attached entity


def test_namespacing(task):
    # both instances own a scoped hinge; distinct qpos slots
    i = task.model.joint_id("left/hinge")
    j = task.model.joint_id("right/hinge")
    assert i != j


def test_scoped_observables_and_step(task):
    state = task.init(jax.random.PRNGKey(0))
    obs = task.observe(state)
    assert {"left/orientation", "left/velocity", "right/orientation",
            "right/velocity"} <= set(obs)
    step = jax.jit(task.step)
    for _ in range(10):
        state = step(state, jnp.array([0.3, -0.2]))
    r = float(task.reward(state, jnp.zeros(2)))
    assert 0.0 <= r <= 1.0
    assert np.isfinite(np.asarray(state.qpos)).all()


def test_per_entity_randomization_independent(task):
    """Each entity draws from its own RNG stream: both hinges vary."""
    q1 = np.asarray(task.init(jax.random.PRNGKey(1)).qpos)
    q2 = np.asarray(task.init(jax.random.PRNGKey(2)).qpos)
    i = task.model.joint_id("left/hinge")
    j = task.model.joint_id("right/hinge")
    assert q1[i] != q2[i] and q1[j] != q2[j]


def test_entities_dynamically_decoupled(task):
    """Driving one pendulum leaves the other at rest (separate trees)."""
    state = task.init(jax.random.PRNGKey(0))
    i = task.model.joint_id("left/hinge")
    j = task.model.joint_id("right/hinge")
    state = state.replace(qpos=state.qpos.at[i].set(0.0).at[j].set(0.0))
    for _ in range(5):
        state = task.step(state, jnp.array([1.0, 0.0]))
    assert abs(float(state.qvel[i])) > 1e-3
    assert float(state.qvel[j]) == 0.0


def test_duplicate_entity_names_collide_distinctly():
    """Two same-named entities would alias joints; distinct names can
    reuse one entity class freely."""
    arena = Arena(size=2.0, timestep=0.02)
    arena.attach(Pendulum("a"), pos=(-0.3, 0, 0.5))
    arena.attach(Pendulum("b"), pos=(0.3, 0, 0.5))
    t = ComposerTask(name="x", arena=arena,
                     reward_fn=lambda m, s, k, c: jnp.float32(0.5),
                     n_sub_steps=1).build()
    assert t.model.nu == 2


def test_vmap_batch(task):
    init = jax.vmap(task.init)
    step = jax.vmap(task.step, in_axes=(0, 0))
    states = init(jax.random.split(jax.random.PRNGKey(0), 4))
    ctrl = jnp.zeros((4, 2), jnp.float32)
    out = jax.jit(step)(states, ctrl)
    assert out.qpos.shape == (4, task.model.nv)
    assert np.isfinite(np.asarray(out.qpos)).all()
