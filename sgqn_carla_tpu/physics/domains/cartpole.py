"""Cartpole domain: balance / balance_sparse / swingup / swingup_sparse.

Model geometry, masses, and option flags follow the published dm_control
cartpole description (reference: src/env/dm_control/dm_control/suite/
cartpole.xml — cart box 0.2×0.15×0.1 mass 1, pole capsule r=0.045 l=1
mass 0.1, slider range ±1.8, RK4 at dt=0.01, contact disabled); task
semantics follow suite/cartpole.py:156-231.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import rewards
from sgqn_carla_tpu.physics.domains import register
from sgqn_carla_tpu.physics.engine import forward_kinematics
from sgqn_carla_tpu.physics.model import BOX, CAPSULE, HINGE, PLANE, SLIDE, ModelBuilder
from sgqn_carla_tpu.physics.task import PhysState, Task

_DEFAULT_TIME_LIMIT = 10.0


def make_model():
    b = ModelBuilder(timestep=0.01, integrator="rk4")
    # statics (render-only; cartpole has contact disabled)
    b.add_geom(0, PLANE, size=(4, 4, 0.2), pos=(0, 0, -0.05), material="grid",
               contype=0, conaffinity=0, name="floor")
    b.add_geom(0, CAPSULE, size=(0.02, 2), pos=(0, 0.07, 1), zaxis=(1, 0, 0),
               material="decoration", contype=0, conaffinity=0, name="rail1")
    b.add_geom(0, CAPSULE, size=(0.02, 2), pos=(0, -0.07, 1), zaxis=(1, 0, 0),
               material="decoration", contype=0, conaffinity=0, name="rail2")
    cart = b.add_body(0, pos=(0, 0, 1), name="cart")
    b.add_joint(cart, SLIDE, axis=(1, 0, 0), limited=True, range=(-1.8, 1.8),
                damping=5e-4, name="slider")
    b.add_geom(cart, BOX, size=(0.2, 0.15, 0.1), mass=1.0, material="self",
               contype=0, conaffinity=0, name="cart")
    pole = b.add_body(cart, name="pole_1")
    b.add_joint(pole, HINGE, axis=(0, 1, 0), damping=2e-6, name="hinge_1")
    b.add_geom(pole, CAPSULE, size=(0.045,), fromto=(0, 0, 0, 0, 0, 1),
               mass=0.1, material="self", contype=0, conaffinity=0, name="pole_1")
    b.add_camera("fixed", pos=(0, -4, 1), zaxis=(0, -1, 0), fovy=45.0)
    b.add_camera("lookatcart", pos=(0, -2, 2), mode="targetbody", target_body=cart)
    b.add_actuator("slider", gear=10.0)
    return b.finalize()


def _init(swing_up: bool):
    def init_fn(model, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        if swing_up:
            slider = 0.01 * jax.random.normal(k1, ())
            hinge = jnp.pi + 0.01 * jax.random.normal(k2, ())
        else:
            slider = jax.random.uniform(k1, (), minval=-0.1, maxval=0.1)
            hinge = jax.random.uniform(k2, (), minval=-0.034, maxval=0.034)
        qpos = jnp.stack([slider, hinge]).astype(jnp.float32)
        qvel = 0.01 * jax.random.normal(k3, (model.nv,), jnp.float32)
        npair = len(model.contact_pairs)
        return PhysState(qpos, qvel, jnp.zeros((npair,), jnp.float32))
    return init_fn


def _observe(model, state: PhysState):
    kin = forward_kinematics(model, state.qpos, state.qvel)
    pole_R = kin.R[1]  # link 1 = pole
    # bounded_position: [cart_x, zz, xz] (suite/cartpole.py:150-153)
    position = jnp.stack([state.qpos[0], pole_R[2, 2], pole_R[0, 2]])
    return {"position": position, "velocity": state.qvel}


def _reward(sparse: bool):
    def reward_fn(model, state: PhysState, kin, ctrl):
        cart_pos = state.qpos[0]
        pole_cos = kin.R[1][2, 2]
        if sparse:
            cart_in = rewards.tolerance(cart_pos, bounds=(-0.25, 0.25))
            angle_in = rewards.tolerance(pole_cos, bounds=(0.995, 1.0))
            return cart_in * angle_in
        upright = (pole_cos + 1) / 2
        centered = (1 + rewards.tolerance(cart_pos, margin=2)) / 2
        small_control = rewards.tolerance(
            jnp.clip(ctrl[0], -1, 1), margin=1, value_at_margin=0,
            sigmoid="quadratic")
        small_control = (4 + small_control) / 5
        small_velocity = (1 + rewards.tolerance(state.qvel[1], margin=5)) / 2
        return upright * small_control * small_velocity * centered
    return reward_fn


def _make(swing_up, sparse, name):
    model = make_model()
    return Task(
        name=name,
        model=model,
        n_sub_steps=1,  # control_timestep == model timestep (no override in suite)
        init_fn=_init(swing_up),
        observe_fn=_observe,
        reward_fn=_reward(sparse),
        camera_id=0,
        time_limit=_DEFAULT_TIME_LIMIT,
    )


@register("cartpole", "balance")
def balance():
    return _make(False, False, "cartpole_balance")


@register("cartpole", "balance_sparse")
def balance_sparse():
    return _make(False, True, "cartpole_balance_sparse")


@register("cartpole", "swingup")
def swingup():
    return _make(True, False, "cartpole_swingup")


@register("cartpole", "swingup_sparse")
def swingup_sparse():
    return _make(True, True, "cartpole_swingup_sparse")
