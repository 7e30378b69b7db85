"""Distracting Control Suite transforms: camera walk + color walk + video
background — as explicit env state.

Behavioral port of the vendored distracting_control wrappers (reference:
src/env/distracting_control/): the spherical camera random walk with
velocity clipping (camera.py:160-351), the per-episode color jitter +
per-step Gaussian color walk over all material RGBs (color.py:23-99), and
the difficulty→num-videos background map with ping-pong dynamic playback
(suite_utils.py:26, background.py:217-239). Intensity scaling follows
suite_utils.get_camera_kwargs / get_color_kwargs (suite_utils.py:30-53).

The reference mutates physics fields (cam_xpos/cam_xmat, mat_rgba, skybox
texture upload); here the walk state is a pytree updated inside the jitted
env step, the colors live in `Appearance`, and the background composites
through the renderer's segmentation mask.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sgqn_carla_tpu.physics.model import CameraSpec, Model
from sgqn_carla_tpu.render.raster import Appearance, Camera

DIFFICULTY_NUM_VIDEOS = {0.025: 2, 0.05: 2, 0.1: 4, 0.15: 6, 0.2: 8,
                         0.3: None, 0.4: None, 0.5: None}


class CamWalkState(struct.PyTreeNode):
    radius: jnp.ndarray
    h: jnp.ndarray
    v: jnp.ndarray
    roll: jnp.ndarray
    vel: jnp.ndarray       # (3,) cartesian velocity
    roll_vel: jnp.ndarray


class DistractState(struct.PyTreeNode):
    cam: CamWalkState
    rng: jnp.ndarray


@dataclass(frozen=True)
class CamWalkConfig:
    """Static bounds derived from the camera spec + intensity
    (reference: camera.py:214-252 setup_camera)."""

    start_r: float
    start_h: float
    start_v: float
    min_h: float
    max_h: float
    min_v: float
    max_v: float
    min_radius: float
    max_radius: float
    roll_delta: float
    vel_std: float
    max_vel: float
    roll_std: float
    max_roll_vel: float
    vel_scaling: float
    trackcom: bool
    lookat0: np.ndarray  # static lookat point (fixed cams)


def _cart2sphere(c):
    r = jnp.sqrt(jnp.sum(c**2))
    return r, jnp.arctan2(c[1], c[0]), jnp.arctan2(
        jnp.sqrt(c[0]**2 + c[1]**2), c[2])


def _sphere2cart(r, h, v):
    return jnp.stack([r * jnp.sin(v) * jnp.cos(h),
                      r * jnp.sin(v) * jnp.sin(h),
                      r * jnp.cos(v)])


def make_cam_config(model: Model, cam_id: int, scale: float,
                    domain_name: str, dynamic: bool = True) -> CamWalkConfig:
    spec: CameraSpec = model.cameras[cam_id]
    trackcom = spec.mode == "trackcom"
    start_pos = spec.pos0 - (model.com0 if trackcom else 0.0)
    r0 = float(np.linalg.norm(start_pos))
    h0 = float(np.arctan2(start_pos[1], start_pos[0]))
    v0 = float(np.arctan2(np.linalg.norm(start_pos[:2]), start_pos[2]))
    limit_upper = "reacher" not in domain_name
    h_delta = v_delta = np.pi / 2 * scale
    max_h, min_h = h0 + h_delta, h0 - h_delta
    max_v, min_v = v0 + v_delta, v0 - v_delta
    if limit_upper:
        max_v, min_v = min(max_v, np.pi / 2), max(min_v, 0.0)
        max_h, min_h = min(max_h, 0.0), max(min_h, -np.pi)
    # static lookat point for fixed cameras: the nearest point to the world
    # origin along the camera's viewing ray (camera looks along -z)
    z0 = spec.R0[:, 2]
    t_star = float(np.dot(spec.pos0, z0))
    lookat0 = spec.pos0 - z0 * t_star
    return CamWalkConfig(
        start_r=r0, start_h=h0, start_v=v0,
        min_h=min_h, max_h=max_h, min_v=min_v, max_v=max_v,
        min_radius=max(r0 - r0 * 0.5 * scale, 0.0),
        max_radius=r0 + r0 * 1.5 * scale,
        roll_delta=np.pi / 2 * scale,
        vel_std=0.1 * scale if dynamic else 0.0,
        max_vel=0.4 * scale if dynamic else 0.0,
        roll_std=np.pi / 300 * scale if dynamic else 0.0,
        max_roll_vel=np.pi / 50 * scale if dynamic else 0.0,
        vel_scaling=r0 / 4.0,
        trackcom=trackcom,
        lookat0=lookat0,
    )


def cam_walk_init(cfg: CamWalkConfig, rng) -> CamWalkState:
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 7)
    f = jnp.float32
    vel = jax.random.normal(k5, (3,), f)
    vel = vel / (jnp.linalg.norm(vel) + 1e-9)
    vel = vel * jax.random.uniform(k6, (), f, 0.0, max(cfg.max_vel, 1e-9))
    return CamWalkState(
        radius=jax.random.uniform(k1, (), f, cfg.min_radius, cfg.max_radius),
        h=jax.random.uniform(k2, (), f, cfg.min_h, cfg.max_h),
        v=jax.random.uniform(k3, (), f, cfg.min_v, cfg.max_v),
        roll=jax.random.uniform(k4, (), f, -cfg.roll_delta, cfg.roll_delta),
        vel=vel,
        roll_vel=jax.random.uniform(k7, (), f, -cfg.max_roll_vel,
                                    max(cfg.max_roll_vel, 1e-9)),
    )


def cam_walk_step(cfg: CamWalkConfig, s: CamWalkState, rng) -> CamWalkState:
    """One `_apply` of the reference random walk (camera.py:293-330)."""
    k1, k2 = jax.random.split(rng)
    vel = s.vel + jax.random.normal(k1, (3,)) * cfg.vel_std * cfg.vel_scaling
    roll_vel = s.roll_vel + jax.random.normal(k2, ()) * cfg.roll_std
    vel_norm = jnp.linalg.norm(vel) + 1e-9
    cap = cfg.max_vel * cfg.vel_scaling
    vel = jnp.where(vel_norm > cap, vel * (cap / vel_norm), vel)
    roll_vel = jnp.clip(roll_vel, -cfg.max_roll_vel, cfg.max_roll_vel)

    cart = _sphere2cart(s.radius, s.h, s.v)
    r2, h2, v2 = _cart2sphere(cart + vel)
    r2 = jnp.clip(r2, cfg.min_radius, cfg.max_radius)
    h2 = jnp.clip(h2, cfg.min_h, cfg.max_h)
    v2 = jnp.clip(v2, cfg.min_v, cfg.max_v)
    vel = _sphere2cart(r2, h2, v2) - cart

    roll2 = jnp.clip(s.roll + roll_vel, -cfg.roll_delta, cfg.roll_delta)
    roll_vel = roll2 - s.roll
    return CamWalkState(radius=r2, h=h2, v=v2, roll=roll2, vel=vel,
                        roll_vel=roll_vel)


def cam_walk_pose(cfg: CamWalkConfig, s: CamWalkState, com,
                  fovy: float) -> Camera:
    """Camera from walk state: lookat-no-roll orientation + roll about the
    view axis (reference: camera.py:330-351 + get_lookat_xmat_no_roll)."""
    f = jnp.float32
    pos_rel = _sphere2cart(s.radius, s.h, s.v)
    if cfg.trackcom:
        pos = pos_rel + com
        lookat = com
    else:
        pos = pos_rel
        lookat = jnp.asarray(cfg.lookat0, f)
    z = pos - lookat
    z = z / (jnp.linalg.norm(z) + 1e-9)
    up = jnp.asarray([0.0, 0.0, 1.0], f)
    x = jnp.cross(up, z)
    x = x / (jnp.linalg.norm(x) + 1e-9)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=1)
    cr, sr = jnp.cos(s.roll), jnp.sin(s.roll)
    roll_mat = jnp.asarray([[cr, -sr, 0.0], [sr, cr, 0.0], [0.0, 0.0, 1.0]], f)
    return Camera(pos=pos, R=R @ roll_mat, fovy=fovy)


# --------------------------------------------------------------- color walk
def color_bounds(app: Appearance, max_delta: float):
    """Static per-field (min, max) = original ± max_delta, clipped to [0,1]
    (reference: color.py:62-66)."""
    lo = jax.tree_util.tree_map(
        lambda x: jnp.clip(x - max_delta, 0.0, 1.0), app)
    hi = jax.tree_util.tree_map(
        lambda x: jnp.clip(x + max_delta, 0.0, 1.0), app)
    return lo, hi


def color_init(lo: Appearance, hi: Appearance, rng) -> Appearance:
    leaves, treedef = jax.tree_util.tree_flatten(lo)
    keys = list(jax.random.split(rng, len(leaves)))
    hi_leaves = jax.tree_util.tree_leaves(hi)
    out = [l + jax.random.uniform(k, l.shape) * (h - l)
           for l, h, k in zip(leaves, hi_leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


def color_step(cur: Appearance, lo: Appearance, hi: Appearance, rng,
               step_std: float) -> Appearance:
    leaves, treedef = jax.tree_util.tree_flatten(cur)
    keys = list(jax.random.split(rng, len(leaves)))
    lo_l = jax.tree_util.tree_leaves(lo)
    hi_l = jax.tree_util.tree_leaves(hi)
    out = [jnp.clip(c + jax.random.normal(k, c.shape) * step_std, l, h)
           for c, l, h, k in zip(leaves, lo_l, hi_l, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


def num_videos_for(intensity: float, pool_size: int) -> int:
    n = DIFFICULTY_NUM_VIDEOS.get(intensity, None)
    return pool_size if n is None else min(n, pool_size)


def pingpong_index(t, length: int):
    """Ping-pong playback index (reference: background.py:217-239)."""
    period = max(2 * length - 2, 1)
    m = jnp.mod(t, period)
    return jnp.where(m < length, m, period - m)
