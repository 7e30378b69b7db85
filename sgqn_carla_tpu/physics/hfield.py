"""Heightfield terrain: generation, sampling, and ray casting.

Implements the MuJoCo `hfield` capability used by quadruped `escape`
(reference: src/env/dm_control/dm_control/suite/quadruped.py:362-423 and
quadruped.xml:13 `<hfield ncol="201" nrow="201" size="30 30 5 .1"/>`):
a per-episode procedurally generated bowl-shaped terrain the quadruped
must climb out of.

Representation: a (res, res) f32 grid of *elevations in meters* (already
scaled by the hfield z-size), row-major over y (rows) × x (cols), spanning
[-half_x, half_x] × [-half_y, half_y], plus the geom's base z offset.
The grid is per-episode dynamic data — it lives in `PhysState.task_aux`
and is threaded into `engine.step(..., hfield=...)`, NOT baked into the
static `Model` (the reference writes it into `physics.model.hfield_data`
and re-uploads the GL texture each episode; here it is just a traced
array).

Contact/query model: bilinear height interpolation with the cell-gradient
normal — the smooth-penalty analogue of MuJoCo's prism decomposition.
All functions are pure and vmappable over an env batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# reference terrain constants (suite/quadruped.py:48-51, quadruped.xml:13)
RES = 201                   # hfield nrow == ncol
TERRAIN_HALF = 30.0         # hfield size x == y half-extent (meters)
TERRAIN_ZMAX = 5.0          # hfield size z: elevation scale (meters)
TERRAIN_Z0 = -0.01          # terrain geom pos z (quadruped.xml:84)
_SMOOTHNESS = 0.15          # _TERRAIN_SMOOTHNESS (quadruped.py:50)
_BUMP_SCALE = 2.0           # _TERRAIN_BUMP_SCALE meters (quadruped.py:51)


def _bowl_np(res: int = RES) -> np.ndarray:
    """Sinusoidal bowl in [0, 1] (quadruped.py:375-378): rim of height 1 at
    half radius, falling back to 0 at the grid edge circle."""
    row, col = np.ogrid[-1:1:res * 1j, -1:1:res * 1j]
    radius = np.clip(np.sqrt(col ** 2 + row ** 2), 0.04, 1)
    return 0.5 - np.cos(2 * np.pi * radius) / 2


_BOWL = _bowl_np()


def generate_terrain(rng, res: int = RES) -> jnp.ndarray:
    """Per-episode terrain grid: bowl × smooth random bumps, scaled to
    meters (quadruped.py:379-387; scipy ndimage.zoom's cubic spline is
    approximated by jax.image.resize cubic — same bump statistics)."""
    bump_res = int(2 * TERRAIN_HALF / _BUMP_SCALE)
    bumps = jax.random.uniform(rng, (bump_res, bump_res), jnp.float32,
                               _SMOOTHNESS, 1.0)
    # cubic interpolation overshoots the sample range; clip back so the
    # elevation stays within the hfield z-scale (MuJoCo hfield data ∈ [0,1])
    smooth = jnp.clip(jax.image.resize(bumps, (res, res), method="cubic"),
                      0.0, 1.0)
    return jnp.asarray(_BOWL, jnp.float32) * smooth * TERRAIN_ZMAX


def _flat_take(terrain, iy, ix):
    res = terrain.shape[-1]
    return jnp.take(terrain.reshape(-1), iy * res + ix, axis=0)


def sample(terrain, x, y, half: float = TERRAIN_HALF,
           z0: float = TERRAIN_Z0):
    """Bilinear surface height + unit normal at world (x, y).

    Outside the grid the edge elevation continues flat (the reference bowl
    is 0 at the grid-edge circle, so the continuation is seamless).
    Returns (h, (nx, ny, nz)) with h in world z and n the upward surface
    normal from the bilinear cell gradient."""
    res = terrain.shape[-1]
    cell = 2.0 * half / (res - 1)
    u = (x / half + 1.0) * 0.5 * (res - 1)
    v = (y / half + 1.0) * 0.5 * (res - 1)
    u = jnp.clip(u, 0.0, res - 1.001)
    v = jnp.clip(v, 0.0, res - 1.001)
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    fu = u - ix
    fv = v - iy
    h00 = _flat_take(terrain, iy, ix)
    h10 = _flat_take(terrain, iy, ix + 1)
    h01 = _flat_take(terrain, iy + 1, ix)
    h11 = _flat_take(terrain, iy + 1, ix + 1)
    h = ((1 - fu) * (1 - fv) * h00 + fu * (1 - fv) * h10
         + (1 - fu) * fv * h01 + fu * fv * h11)
    dhdx = ((1 - fv) * (h10 - h00) + fv * (h11 - h01)) / cell
    dhdy = ((1 - fu) * (h01 - h00) + fu * (h11 - h10)) / cell
    inv = jax.lax.rsqrt(dhdx * dhdx + dhdy * dhdy + 1.0)
    return h + z0, (-dhdx * inv, -dhdy * inv, inv)


def raycast_segment(terrain, o, d, t_lo, t_hi, n_coarse: int = 32,
                    n_refine: int = 8, half: float = TERRAIN_HALF,
                    z0: float = TERRAIN_Z0):
    """First ray-surface intersection on [t_lo, t_hi] per ray, by
    fixed-step marching + bisection.

    o/d are component tuples (ox, oy, oz)/(dx, dy, dz); t_lo/t_hi arrays
    of the ray shape (the renderer clips to the terrain AABB first).
    Returns (t, n, hit): hit distance (t_hi where missed), surface normal,
    bool hit. Conservative for slopes < cell/step ratio — the bowl's ≤45°
    slopes at the default 32 steps; `n_refine` bisection halvings sharpen
    the silhouette."""
    f = jnp.float32
    fracs = jnp.linspace(0.0, 1.0, n_coarse, dtype=f)
    span = t_hi - t_lo

    def above(t):
        x = o[0] + t * d[0]
        y = o[1] + t * d[1]
        z = o[2] + t * d[2]
        h, _ = sample(terrain, x, y, half, z0)
        return z > h

    # first sign change along the march
    def scan_body(carry, frac):
        t_first, prev_above, t_prev, found = carry
        t = t_lo + frac * span
        ab = above(t)
        crossed = prev_above & (~ab) & (~found)
        t_first = jnp.where(crossed, t_prev, t_first)
        return (t_first, ab, t, found | crossed), None

    shape = jnp.broadcast_shapes(*(jnp.shape(c) for c in o + d),
                                 jnp.shape(t_lo), jnp.shape(t_hi))
    init = (jnp.broadcast_to(t_hi, shape).astype(f),
            jnp.ones(shape, bool),
            jnp.broadcast_to(t_lo, shape).astype(f),
            jnp.zeros(shape, bool))
    (t_a, _, _, hit), _ = jax.lax.scan(scan_body, init, fracs)
    # bisection refine inside [t_a, t_a + step]
    step = span / (n_coarse - 1)
    lo, hi = t_a, t_a + step
    for _ in range(n_refine):
        mid = 0.5 * (lo + hi)
        ab = above(mid)
        lo = jnp.where(ab, mid, lo)
        hi = jnp.where(ab, hi, mid)
    t = jnp.where(hit, 0.5 * (lo + hi), t_hi)
    _, n = sample(terrain, o[0] + t * d[0], o[1] + t * d[1], half, z0)
    return t, n, hit


def raycast(terrain, o, d, tmax: float, n_coarse: int = 32,
            n_refine: int = 8, half: float = TERRAIN_HALF,
            z0: float = TERRAIN_Z0):
    """raycast_segment over [0, tmax] (the rangefinder entry point)."""
    shape = jnp.broadcast_shapes(*(jnp.shape(c) for c in o + d))
    zero = jnp.zeros(shape, jnp.float32)
    return raycast_segment(terrain, o, d, zero, zero + tmax, n_coarse,
                           n_refine, half, z0)
