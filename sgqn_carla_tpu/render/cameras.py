"""Camera pose resolution: fixed / trackcom / targetbody modes.

Mirrors MuJoCo camera semantics used by the DMC domains (reference:
suite/walker.xml:25-26 trackcom cameras, suite/cartpole.xml:19-20 fixed +
targetbody). The distracting-control camera random walk overrides the pose
downstream (see envs/distracting.py), so this returns a plain `Camera`
value rather than mutating any state.
"""

from __future__ import annotations

import jax.numpy as jnp

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.math3d import quat_to_mat
from sgqn_carla_tpu.physics.model import Model
from sgqn_carla_tpu.render.raster import Camera


def camera_pose(model: Model, cam_id: int, kin: engine.Kin) -> Camera:
    spec = model.cameras[cam_id]
    f = kin.R.dtype
    pos = jnp.asarray(spec.pos0, f)
    R = jnp.asarray(spec.R0, f)
    if spec.mode == "trackcom":
        # MuJoCo trackcom: translate with the robot subtree COM, keeping the
        # compile-time offset (cam_pos0 - com0) and a fixed orientation.
        root = _root_link(model)
        com = engine.subtree_com(model, kin, root)
        pos = com + jnp.asarray(spec.pos0 - model.com0, f)
    elif spec.mode == "targetbody":
        target = kin.p[spec.target_body if spec.target_body >= 0 else 0]
        z = pos - target
        z = z / (jnp.linalg.norm(z) + 1e-9)
        up = jnp.asarray([0.0, 0.0, 1.0], f)
        x = jnp.cross(up, z)
        x = x / (jnp.linalg.norm(x) + 1e-9)
        y = jnp.cross(z, x)
        R = jnp.stack([x, y, z], axis=1)
    return Camera(pos=pos, R=R, fovy=spec.fovy)


def _root_link(model: Model) -> int:
    """Last link of the root chain (the link carrying the root body mass)."""
    for i in range(model.nl):
        if model.link_mass[i] > 0:
            return i
    return 0
