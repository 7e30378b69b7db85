"""MJCF-subset compiler tests: compile the *actual* reference suite XMLs and
check the resulting models against the hand-authored domain models.

This is the parity audit VERDICT missing-#9 asked for: hand-authored domains
are no longer unchecked transcriptions — every shared quantity (joint names,
inertias, damping/armature, ranges, actuator moments, contact-pair counts) is
cross-verified against what the MuJoCo compiler would see in the XML
(reference: src/env/dm_control/dm_control/suite/*.xml).

Skipped wholesale when the reference checkout isn't mounted.
"""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.domains import load
from sgqn_carla_tpu.physics.mjcf import load_model, load_model_string
from sgqn_carla_tpu.physics.task import PhysState

SUITE = "/root/reference/src/env/dm_control/dm_control/suite"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SUITE), reason="reference suite XMLs not mounted"
)


def test_all_suite_xmls_compile():
    xmls = sorted(glob.glob(os.path.join(SUITE, "*.xml")))
    assert len(xmls) == 18
    for path in xmls:
        model = load_model(path)
        assert model.nl >= 0 and len(model.geoms) > 0, path


# (domain, task, xml): tasks whose hand-authored model should match the XML
# exactly.  lqr/swimmer are excluded — their reference models are generated
# procedurally by suite/lqr.py:make_model and suite/swimmer.py:_make_body, the
# .xml on disk is only a shell.  manipulator/stacker/quadruped are compared
# structurally below (hand-authored versions deliberately simplify: stacker
# prunes unused boxes per task, quadruped models the flat-terrain tasks).
_EXACT = [
    ("walker", "walk", "walker"),
    ("cartpole", "swingup", "cartpole"),
    ("cheetah", "run", "cheetah"),
    ("hopper", "hop", "hopper"),
    ("pendulum", "swingup", "pendulum"),
    ("acrobot", "swingup", "acrobot"),
    ("reacher", "easy", "reacher"),
    ("ball_in_cup", "catch", "ball_in_cup"),
    ("point_mass", "easy", "point_mass"),
    ("finger", "turn_easy", "finger"),
    ("fish", "swim", "fish"),
    ("humanoid", "walk", "humanoid"),
    ("humanoid_CMU", "stand", "humanoid_CMU"),
]


@pytest.mark.parametrize("domain,task,xml", _EXACT,
                         ids=[c[0] for c in _EXACT])
def test_compiled_matches_hand_authored(domain, task, xml):
    m = load_model(os.path.join(SUITE, xml + ".xml"))
    h = load(domain, task).model

    assert m.joint_names == h.joint_names
    assert m.nl == h.nl and m.nu == h.nu
    assert m.integrator == h.integrator
    if domain != "finger":
        # finger deliberately runs dt=0.0025 (vs XML 0.01) for penalty-contact
        # stability on the light spinner — documented in domains/finger.py
        assert m.timestep == pytest.approx(h.timestep)
    np.testing.assert_allclose(m.gravity, h.gravity, atol=1e-12)

    np.testing.assert_allclose(m.jnt_damping, h.jnt_damping, atol=1e-12)
    np.testing.assert_allclose(m.jnt_armature, h.jnt_armature, atol=1e-12)
    np.testing.assert_allclose(m.jnt_stiffness, h.jnt_stiffness, atol=1e-12)
    np.testing.assert_allclose(m.jnt_ref, h.jnt_ref, atol=1e-12)
    np.testing.assert_array_equal(m.jnt_limited, h.jnt_limited)
    # ranges only matter where limited
    lim = m.jnt_limited
    np.testing.assert_allclose(m.jnt_range[lim], h.jnt_range[lim], atol=1e-9)
    np.testing.assert_allclose(m.link_mass, h.link_mass, atol=1e-9)
    np.testing.assert_allclose(m.link_inertia, h.link_inertia, atol=1e-7)
    np.testing.assert_allclose(m.act_moment, h.act_moment, atol=1e-12)
    np.testing.assert_array_equal(m.act_kind, h.act_kind)
    assert len(m.contact_pairs) == len(h.contact_pairs)
    assert len(m.tendons) == len(h.tendons)


@pytest.mark.parametrize("domain,task,xml,why", [
    ("manipulator", "bring_ball", "manipulator",
     "XML carries both ball and peg objects + receptacles; each task variant "
     "uses one (suite/manipulator.py:66-73 prunes via use_peg/insert); the "
     "hand model names the survivor object_*"),
    ("stacker", "stack_2", "stacker",
     "XML carries 4 boxes; stack_2 uses 2 (suite/stacker.py:48-53 prunes)"),
    ("quadruped", "walk", "quadruped",
     "walk prunes the fetch ball from the XML (suite/quadruped.py pruning), "
     "exactly as the hand model's walls_and_ball=False"),
])
def test_compiled_structural(domain, task, xml, why):
    m = load_model(os.path.join(SUITE, xml + ".xml"))
    h = load(domain, task).model
    assert m.nu == h.nu, why
    assert m.nl >= h.nl, why
    # every hand-authored actuated joint name must exist in the XML
    xml_names = set(m.joint_names)
    for dof in h.act_dof if len(h.act_dof) else []:
        assert h.joint_names[dof] in xml_names


def test_quadruped_fetch_matches_full_xml_structure():
    """quadruped *fetch* keeps the ball — the one task whose model is the
    un-pruned quadruped.xml; all 28 joints must line up by name."""
    m = load_model(os.path.join(SUITE, "quadruped.xml"))
    h = load("quadruped", "fetch").model
    assert m.joint_names == h.joint_names
    assert m.nl == h.nl == 28


def test_compiled_walker_steps_identically():
    """An MJCF-compiled model is interchangeable with the hand-authored one:
    identical parameters ⇒ (numerically) identical trajectories."""
    m = load_model(os.path.join(SUITE, "walker.xml"))
    h = load("walker", "walk").model

    import jax

    qpos = jnp.array(np.linspace(-0.1, 0.1, m.nl), jnp.float32)
    qvel = jnp.zeros(m.nl, jnp.float32)
    ctrl = jnp.array(np.linspace(-0.5, 0.5, m.nu), jnp.float32)

    def roll(model):
        @jax.jit
        def run(q, v):
            def body(carry, _):
                out = engine.step(model, carry[0], carry[1], ctrl)
                return (out.qpos, out.qvel), None

            (q, v), _ = jax.lax.scan(body, (q, v), None, length=50)
            return q, v

        return run(qpos, qvel)

    qm, vm = roll(m)
    qh, vh = roll(h)
    np.testing.assert_allclose(np.asarray(qm), np.asarray(qh), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vh), atol=1e-5)


def test_compiled_model_renders():
    """The XML path carries everything the renderer needs (geoms, materials,
    cameras): render one frame from the compiled cartpole."""
    from sgqn_carla_tpu.render import raster
    from sgqn_carla_tpu.render.cameras import camera_pose

    m = load_model(os.path.join(SUITE, "cartpole.xml"))
    app = raster.default_appearance(m)
    kin = engine.forward_kinematics(
        m, jnp.zeros(m.nl, jnp.float32), jnp.zeros(m.nl, jnp.float32)
    )
    cam = camera_pose(m, 0, kin)
    rgb, depth, seg = raster.render(m, kin, app, cam, height=84, width=84)
    rgb = np.asarray(rgb)
    assert rgb.shape == (84, 84, 3)
    assert rgb.std() > 1.0  # not a blank frame
    assert np.asarray(seg).max() >= 0  # at least one geom visible


def test_defaults_and_childclass_resolution():
    xml = """
    <mujoco>
      <default>
        <joint damping="9"/>
        <default class="a">
          <joint damping="1" armature="0.5"/>
          <geom type="capsule" size="0.1 0.2"/>
        </default>
      </default>
      <worldbody>
        <body name="x" pos="0 0 1" childclass="a">
          <joint name="j1"/>
          <geom name="g1" material="self"/>
          <body name="y" pos="0 0 -0.4">
            <joint name="j2" class="a" damping="3"/>
            <joint name="j3"/>
            <geom name="g2" type="sphere" size="0.05" class="a"/>
          </body>
        </body>
      </worldbody>
    </mujoco>"""
    m = load_model_string(xml)
    # j1 gets class-a damping 1; j2 overrides to 3; j3 inherits childclass a
    assert m.jnt_damping[m.joint_id("j1")] == 1.0
    assert m.jnt_damping[m.joint_id("j2")] == 3.0
    assert m.jnt_damping[m.joint_id("j3")] == 1.0
    assert m.jnt_armature[m.joint_id("j1")] == 0.5
    from sgqn_carla_tpu.physics.model import CAPSULE, SPHERE

    assert m.geoms[0].gtype == CAPSULE  # class-a default type
    assert m.geoms[1].gtype == SPHERE   # explicit override


def test_weld_composes_frames():
    """A jointless body merges into its parent with composed frames — its
    geom mass and world pose must match the un-welded equivalent."""
    welded = load_model_string("""
    <mujoco>
      <worldbody>
        <body name="a" pos="0 0 1">
          <joint name="j" type="hinge" axis="0 1 0"/>
          <geom name="ga" type="sphere" size="0.1" mass="1"/>
          <body name="w" pos="0.5 0 0" euler="0 0 90">
            <geom name="gw" type="capsule" fromto="0 0 0 0.2 0 0" size="0.05" mass="2"/>
          </body>
        </body>
      </worldbody>
    </mujoco>""")
    flat = load_model_string("""
    <mujoco>
      <worldbody>
        <body name="a" pos="0 0 1">
          <joint name="j" type="hinge" axis="0 1 0"/>
          <geom name="ga" type="sphere" size="0.1" mass="1"/>
          <geom name="gw" type="capsule" fromto="0.5 0 0 0.5 0.2 0" size="0.05" mass="2"/>
        </body>
      </worldbody>
    </mujoco>""")
    assert welded.nl == flat.nl == 1
    np.testing.assert_allclose(welded.link_mass, flat.link_mass, atol=1e-12)
    np.testing.assert_allclose(welded.link_com, flat.link_com, atol=1e-12)
    np.testing.assert_allclose(welded.link_inertia, flat.link_inertia,
                               atol=1e-10)
    gw, gf = welded.geoms[1], flat.geoms[1]
    np.testing.assert_allclose(gw.pos, gf.pos, atol=1e-12)
    np.testing.assert_allclose(gw.size, gf.size, atol=1e-12)
