"""Structure-of-arrays vector algebra for TPU.

TPU memory is tiled (sublane × lane = 8 × 128 for f32) over the LAST TWO
array dimensions. Arrays shaped (..., 3) / (..., 4) / (..., 6) — the natural
"array-of-vectors" layout — therefore pad 3→128 lanes: ~2.3% lane
utilization and 42× memory bloat on every op. The TPU-native layout is
structure-of-arrays: a vec3 is a tuple of three (...,)-shaped arrays whose
last dim is the big batch/pixel axis, so every elementwise op runs on full
128-wide lanes.

This module gives vec3 / quaternion / 6D-spatial-vector math over tuples of
arrays. Under `vmap`, each component is a (B,) array; in the renderer, a
(P,) pixel array. Everything fuses into wide VPU loops.
"""

from __future__ import annotations

import jax.numpy as jnp

# ------------------------------------------------------------------- vec3

def v3(x, y, z):
    return (x, y, z)


def splat(c, like=None):
    """Constant vec3 from floats."""
    return (jnp.float32(c[0]), jnp.float32(c[1]), jnp.float32(c[2]))


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def norm(a, eps=0.0):
    return jnp.sqrt(dot(a, a) + eps)


def normalize(a, eps=1e-9):
    n = norm(a)
    inv = 1.0 / (n + eps)
    return scale(a, inv), n


def where(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def lerp(a, b, t):
    return add(scale(a, 1.0 - t), scale(b, t))


def stack(a, axis=-1):
    return jnp.stack(a, axis=axis)


def unstack(arr, axis=-1):
    return tuple(jnp.moveaxis(arr, axis, 0))


# ------------------------------------------------------------ quaternions
# quaternion = (w, x, y, z) tuple of arrays

def qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def qrot(q, v):
    """Rotate vec3 v by quaternion q: v + 2 w (qv × v) + 2 qv × (qv × v)."""
    qv = (q[1], q[2], q[3])
    t = scale(cross(qv, v), 2.0)
    return add(add(v, scale(t, q[0])), cross(qv, t))


def qrot_inv(q, v):
    """Rotate by the conjugate (world → local)."""
    return qrot((q[0], -q[1], -q[2], -q[3]), v)


def q_axis_angle(axis, angle):
    half = angle * 0.5
    s = jnp.sin(half)
    return (jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s)


def q_columns(q):
    """The three world-frame basis vectors (columns of R) of quaternion q."""
    w, x, y, z = q
    cx = (1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y))
    cy = (2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x))
    cz = (2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y))
    return cx, cy, cz


# --------------------------------------------------- 6D spatial vectors
# spatial motion/force vector = (w3, v3) pair of vec3 tuples

def s_add(a, b):
    return (add(a[0], b[0]), add(a[1], b[1]))


def s_scale(a, s):
    return (scale(a[0], s), scale(a[1], s))


def s_dot(a, b):
    return dot(a[0], b[0]) + dot(a[1], b[1])


def s_crm(v, m):
    """motion × motion."""
    w, v0 = v
    mw, mv = m
    return (cross(w, mw), add(cross(w, mv), cross(v0, mw)))


def s_crf(v, f):
    """motion ×* force."""
    w, v0 = v
    n, f0 = f
    return (add(cross(w, n), cross(v0, f0)), cross(w, f0))
