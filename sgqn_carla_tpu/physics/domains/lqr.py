"""LQR domain: lqr_2_1 / lqr_6_2 — chains of masses on springy sliders.

Mirrors the reference's procedurally generated linear system
(reference: src/env/dm_control/dm_control/suite/lqr.py:116-264 and lqr.xml):
`n_bodies` spheres chained along x, each on a y-axis slide joint with
stiffness ~ U(15, 25) and zero damping; the first `n_actuators` joints are
motor-actuated (gear 1). Contacts are disabled (lqr.xml `<flag
constraint="disable"/>`); timestep 0.03 with no control sub-stepping.

Divergence (documented): the reference samples joint stiffness with the
task's RandomState at *model build* time (lqr.py:139-141) — a different
linear system per environment instance. Models here are compiled once at
trace time, so stiffness is drawn from a fixed seed; the task family is
the same LQR class.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.model import PLANE, SLIDE, SPHERE, BOX, ModelBuilder
from sgqn_carla_tpu.physics.task import PhysState, Task

_CONTROL_COST_COEF = 0.1  # reference: lqr.py:37


def make_model(n_bodies: int, n_actuators: int, stiffness=None):
    """`stiffness`: optional per-joint override (parity tests pass the
    golden recording's seed-derived values to instantiate the same
    linear system; default draws the fixed-seed family)."""
    rnd = np.random.RandomState(42)
    b = ModelBuilder(timestep=0.03, integrator="euler")
    b.add_geom(0, PLANE, size=(4, 1, 0.2), material="grid", name="floor",
               contype=0, conaffinity=0)
    # decoration strip (lqr.xml "origin" box, rgba .5 .5 .5 .5)
    b.add_geom(0, BOX, size=(2, 0.003, 0.05), pos=(2, 0, 0.05),
               rgba=(0.5, 0.5, 0.5, 0.5), material="decoration",
               name="origin", contype=0, conaffinity=0)
    parent = 0
    for i in range(n_bodies):
        pos = (0.25, 0, 0.1) if i == 0 else (0.25, 0, 0)
        body = b.add_body(parent, pos=pos, name=f"body_{i}")
        k = float(rnd.uniform(15, 25)) if stiffness is None \
            else float(stiffness[i])
        b.add_joint(body, SLIDE, axis=(0, 1, 0),
                    stiffness=k, damping=0.0, name=f"joint_{i}")
        b.add_geom(body, SPHERE, size=(0.1,), material="self",
                   name=f"geom_{i}", contype=0, conaffinity=0)
        parent = body
    for i in range(n_actuators):
        b.add_actuator(f"joint_{i}", gear=1.0)
    # cam0 (lqr.xml:22)
    b.add_camera("cam0", pos=(-1.428, -0.311, 0.856),
                 xyaxes=(0.099, -0.995, 0.0, 0.350, 0.035, 0.936),
                 mode="fixed", fovy=45.0, body=0)
    return b.finalize()


def _init(model, rng):
    # random state on a sqrt(2)-radius sphere (reference: lqr.py:243-247)
    import jax

    u = jax.random.normal(rng, (model.nv,), jnp.float32)
    qpos = jnp.sqrt(2.0) * u / jnp.linalg.norm(u)
    npair = len(model.contact_pairs)
    return PhysState(qpos, jnp.zeros(model.nv, jnp.float32),
                     jnp.zeros((npair,), jnp.float32))


def _observe(model, state: PhysState):
    return {"position": state.qpos, "velocity": state.qvel}


def _reward(model, state: PhysState, kin, ctrl):
    # 1 − (½|q|² + c·½|u|²)  (reference: lqr.py:258-263)
    state_cost = 0.5 * jnp.sum(state.qpos * state.qpos)
    ctrl_cost = 0.5 * jnp.sum(ctrl * ctrl)
    return 1.0 - (state_cost + _CONTROL_COST_COEF * ctrl_cost)


def _make(n_bodies, n_actuators, name, stiffness=None):
    model = make_model(n_bodies, n_actuators, stiffness=stiffness)
    return Task(
        name=name, model=model, n_sub_steps=1,
        init_fn=_init, observe_fn=_observe, reward_fn=_reward,
        camera_id=0,
        time_limit=25.0,  # reference runs unbounded (lqr.py:37); the driver
        # bounds episodes with episode_length either way
    )


@register("lqr", "lqr_2_1")
def lqr_2_1(stiffness=None):
    return _make(2, 1, "lqr_lqr_2_1", stiffness=stiffness)


@register("lqr", "lqr_6_2")
def lqr_6_2(stiffness=None):
    return _make(6, 2, "lqr_lqr_6_2", stiffness=stiffness)
