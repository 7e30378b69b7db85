"""dm_control-style `Physics` API tests (physics/api.py).

Reference surface: mujoco.Physics (engine.py:85) — from_xml_string,
reset/set_control/step, render, named indexing (mujoco/index.py)."""

import numpy as np
import pytest

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.api import Physics
from sgqn_carla_tpu.physics.domains import load

_XML = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1"/>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" axis="1 0 0" damping="0.1"/>
      <geom name="cart" type="box" size="0.2 0.15 0.1" mass="1"/>
    </body>
    <camera name="fixed" pos="0 -3 1" zaxis="0 -1 0"/>
  </worldbody>
  <actuator><motor name="slide" joint="slider" gear="10"/></actuator>
</mujoco>"""


def test_from_xml_string_and_step():
    physics = Physics.from_xml_string(_XML)
    assert physics.model.nu == 1 and physics.model.nl == 1
    physics.set_control([1.0])
    physics.step(20)
    # force 10 N on 1 kg for 0.2 s → moved right, positive velocity
    assert physics.named.qpos["slider"] > 0.01
    assert physics.named.qvel["slider"] > 0.1


def test_named_write_and_reset_context():
    physics = Physics.from_xml_string(_XML)
    with physics.reset_context():
        physics.named.qpos["slider"] = 0.5
    assert physics.qpos[0] == pytest.approx(0.5)
    physics.reset()
    assert physics.qpos[0] == 0.0
    with pytest.raises(KeyError):
        physics.named.qpos["nope"]


def test_matches_functional_engine():
    """The shell must delegate to the exact same jitted pure step."""
    physics = Physics.from_xml_string(_XML)
    physics.set_control([0.7])
    physics.step(10)

    import jax.numpy as jnp

    q = jnp.zeros(1, jnp.float32)
    v = jnp.zeros(1, jnp.float32)
    u = jnp.asarray([0.7], jnp.float32)
    for _ in range(10):
        out = engine.step(physics.model, q, v, u)
        q, v = out.qpos, out.qvel
    np.testing.assert_allclose(physics.qpos, np.asarray(q), atol=1e-6)
    np.testing.assert_allclose(physics.qvel, np.asarray(v), atol=1e-6)


def test_render_and_body_xpos():
    physics = Physics.from_model(load("cartpole", "balance").model)
    frame = physics.render(64, 64, camera_id=0)
    assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8
    assert frame.std() > 1.0
    p = physics.body_xpos("cart")
    assert p[2] == pytest.approx(1.0, abs=1e-5)
