"""Quaternion / rotation / 6D spatial-algebra primitives.

Pure jnp, shape-stable, differentiable. Spatial vectors use the Plücker
convention ``[angular; linear-at-world-origin]``: the linear velocity of a
world point x under motion vector ``(w, v0)`` is ``w × x + v0``.

These back the Featherstone dynamics in `physics/engine.py`; everything here
is trivially vmappable over an environment batch.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------- quaternions
def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_from_axis_angle(axis, angle):
    """axis: (..., 3) unit; angle: (...,) radians."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_to_mat(q):
    """Unit quaternion (w,x,y,z) → 3×3 rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat_from_euler_xyz(euler):
    """MuJoCo-style extrinsic xyz euler (degrees NOT assumed; radians in)."""
    cx, cy, cz = jnp.cos(euler[..., 0]), jnp.cos(euler[..., 1]), jnp.cos(euler[..., 2])
    sx, sy, sz = jnp.sin(euler[..., 0]), jnp.sin(euler[..., 1]), jnp.sin(euler[..., 2])
    # R = Rz @ Ry @ Rx (extrinsic x-y-z == intrinsic z-y'-x'')
    r = jnp.stack(
        [
            cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz,
            cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz,
            -sy, sx * cy, cx * cy,
        ],
        axis=-1,
    )
    return r.reshape(euler.shape[:-1] + (3, 3))


def zaxis_to_quat_np(z):
    """Host-side: quaternion rotating +z onto direction `z` (numpy, build time)."""
    import numpy as np

    z = np.asarray(z, dtype=np.float64)
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(up, z))
    if c > 1 - 1e-10:
        return np.array([1.0, 0.0, 0.0, 0.0])
    if c < -1 + 1e-10:
        return np.array([0.0, 1.0, 0.0, 0.0])  # 180° about x
    axis = np.cross(up, z)
    axis = axis / np.linalg.norm(axis)
    angle = np.arccos(c)
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q — pure elementwise VPU work
    (no 3×3 matmul; t = 2 q_vec × v; v' = v + w t + q_vec × t)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


# -------------------------------------------------------------- 3D utilities
def cross_mat(v):
    """Skew-symmetric matrix of (..., 3)."""
    zero = jnp.zeros_like(v[..., 0])
    r = jnp.stack(
        [
            zero, -v[..., 2], v[..., 1],
            v[..., 2], zero, -v[..., 0],
            -v[..., 1], v[..., 0], zero,
        ],
        axis=-1,
    )
    return r.reshape(v.shape[:-1] + (3, 3))


# ------------------------------------------------------- 6D spatial vectors
def crm(v, m):
    """Spatial cross product: motion × motion. v, m: (..., 6)."""
    w, v0 = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(v0, mw)], axis=-1
    )


def crf(v, f):
    """Spatial cross product: motion ×* force. v, f: (..., 6)."""
    w, v0 = v[..., :3], v[..., 3:]
    n, f0 = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(v0, f0), jnp.cross(w, f0)], axis=-1
    )


def spatial_inertia(mass, com, inertia_com):
    """Spatial inertia (6×6) about the world origin.

    mass: (...,), com: (..., 3) world position of the COM,
    inertia_com: (..., 3, 3) rotational inertia about the COM in world axes.
    """
    cx = cross_mat(com)
    m = mass[..., None, None]
    top_left = inertia_com + m * cx @ cx.swapaxes(-1, -2)
    top_right = m * cx
    bot_left = m * cx.swapaxes(-1, -2)
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def quat_to_euler_xyz(q):
    """Intrinsic x-y-z Euler angles (a, b, c) with R = Rx(a)·Ry(b)·Rz(c).

    This is the chart used by the builder's `add_free_root` hinge triplet:
    converting a sampled random quaternion into root hinge angles
    reproduces the same world orientation (fish/quadruped/humanoid episode
    initializers set the root quaternion directly; reference:
    suite/fish.py:141-143, suite/quadruped.py:121-131)."""
    import jax.numpy as jnp

    R = quat_to_mat(q)
    b = jnp.arcsin(jnp.clip(R[0, 2], -1.0, 1.0))
    c = jnp.arctan2(-R[0, 1], R[0, 0])
    a = jnp.arctan2(-R[1, 2], R[2, 2])
    return jnp.stack([a, b, c])
