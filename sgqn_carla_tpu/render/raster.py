"""On-device analytic ray-cast renderer: RGB + depth + segmentation.

TPU-native replacement for the reference's OpenGL stack (EGL/GLFW/OSMesa
contexts + `mjr_render`/`mjr_readPixels`, reference: src/env/dm_control/
dm_control/_render/__init__.py:17-53 and mujoco/engine.py:684-762). Instead
of rasterizing triangles on a GPU driver thread and reading pixels back to
the host, each pixel traces one analytic ray against the geom list entirely
in jnp:

  * primitives: plane (checker texture + edge marks), sphere, capsule,
    box, cylinder, ellipsoid — the full set used by the DMC benchmark
    domains;
  * outputs the same rgb/depth/segmentation trio as `Camera.render`
    (engine.py:684-762). The segmentation channel gives *exact* background
    masks, replacing the reference's per-pixel HSV chroma-key greenscreen
    (env/wrappers.py:390-420) with a mechanism that cannot misclassify;
  * appearance (material colors, skybox gradient) is a dynamic `Appearance`
    pytree — the color benchmarks become array swaps instead of MJCF XML
    rewrites (reference: suite/common/settings.py:15-79).

Layout: ALL hot math is structure-of-arrays (see ops/v3.py) — ray and hit
state live as tuples of (P,)-shaped component arrays whose last dim is the
pixel axis, so every op runs full 128-wide VPU lanes instead of padding a
trailing xyz dim to 128. Closest-hit compositing is a gather-free
where-chain over the static geom list. Per-geom loops unroll at trace time.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sgqn_carla_tpu.ops import v3
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, CYLINDER, ELLIPSOID, PLANE, SPHERE, Model,
)

_INF = 1e9


class Camera(NamedTuple):
    """MuJoCo-convention camera: x right, y up, looking along -z."""

    pos: jnp.ndarray   # (3,)
    R: jnp.ndarray     # (3, 3) world-from-camera
    fovy: float        # vertical field of view, degrees (static)


class Appearance(struct.PyTreeNode):
    """Dynamic scene appearance. One per env; vmap for batches.

    Mirrors exactly the knobs the DMCGB color/video benchmarks mutate
    (reference: suite/common/settings.py:29-72 + env/wrappers.py:96-101)."""

    geom_rgba: jnp.ndarray      # (ngeom, 4) resolved per-geom colors
    grid_rgb1: jnp.ndarray      # (3,) checker color 1
    grid_rgb2: jnp.ndarray      # (3,) checker color 2
    grid_markrgb: jnp.ndarray   # (3,) checker edge-mark color
    skybox_rgb: jnp.ndarray     # (3,) gradient top
    skybox_rgb2: jnp.ndarray    # (3,) gradient bottom
    skybox_markrgb: jnp.ndarray # (3,)


# material name → default rgba (reference: suite/common/materials.xml)
MATERIALS = {
    "self": (0.7, 0.5, 0.3, 1.0),
    "self_default": (0.7, 0.5, 0.3, 1.0),
    "self_highlight": (0.0, 0.5, 0.3, 1.0),
    "effector": (0.7, 0.4, 0.2, 1.0),
    "decoration": (0.3, 0.5, 0.7, 1.0),
    "eye": (0.0, 0.2, 1.0, 1.0),
    "target": (0.6, 0.3, 0.3, 1.0),
    "site": (0.5, 0.5, 0.5, 0.3),
    "grid": (0.5, 0.5, 0.5, 1.0),  # replaced by checker texture
}

GRID_RGB1 = np.array([0.1, 0.2, 0.3])
GRID_RGB2 = np.array([0.2, 0.3, 0.4])
GRID_MARK = np.array([0.2, 0.3, 0.4])
SKY_RGB1 = np.array([0.4, 0.6, 0.8])
SKY_RGB2 = np.array([0.0, 0.0, 0.0])
SKY_MARK = np.array([1.0, 1.0, 1.0])


def default_appearance(model: Model) -> Appearance:
    rgba = np.zeros((len(model.geoms), 4), np.float32)
    for i, g in enumerate(model.geoms):
        rgba[i] = MATERIALS.get(g.material, tuple(g.rgba))
    return Appearance(
        geom_rgba=jnp.asarray(rgba),
        grid_rgb1=jnp.asarray(GRID_RGB1, jnp.float32),
        grid_rgb2=jnp.asarray(GRID_RGB2, jnp.float32),
        grid_markrgb=jnp.asarray(GRID_MARK, jnp.float32),
        skybox_rgb=jnp.asarray(SKY_RGB1, jnp.float32),
        skybox_rgb2=jnp.asarray(SKY_RGB2, jnp.float32),
        skybox_markrgb=jnp.asarray(SKY_MARK, jnp.float32),
    )


# --------------------------------------------------------------- primitives
# o: vec3 of scalars (ray origin); d: vec3 of (P,) arrays (ray directions)

def _isect_plane(o, d, n, p0, ex, ey, size):
    """Ray vs finite plane patch. n/ex/ey: plane basis (vec3 of scalars)."""
    denom = v3.dot(d, n)
    denom_s = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    t = v3.dot(v3.sub(p0, o), n) / denom_s
    hit = v3.add(o, v3.scale(d, t))
    rel = v3.sub(hit, p0)
    lx = v3.dot(rel, ex)
    ly = v3.dot(rel, ey)
    inside = (jnp.abs(lx) <= size[0]) & (jnp.abs(ly) <= size[1])
    valid = (t > 1e-4) & inside & (denom < 0)
    return jnp.where(valid, t, _INF), (lx, ly), hit


def _isect_sphere(o, d, c, r):
    oc = v3.sub(o, c)
    b = v3.dot(d, oc)
    cc = v3.dot(oc, oc) - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    valid = (disc > 0) & (t > 1e-4)
    t = jnp.where(valid, t, _INF)
    hit = v3.add(o, v3.scale(d, t))
    normal = v3.scale(v3.sub(hit, c), 1.0 / r)
    return t, normal


def _isect_capsule(o, d, pa, ba, baba, r):
    """Ray vs capsule with axis segment pa → pa+ba (|ba|² = baba)."""
    oa = v3.sub(o, pa)
    bard = v3.dot(d, ba)
    baoa = v3.dot(oa, ba)
    rdoa = v3.dot(d, oa)
    oaoa = v3.dot(oa, oa)
    a = baba - bard * bard
    b = baba * rdoa - baoa * bard
    c = baba * oaoa - baoa * baoa - r * r * baba
    h = b * b - a * c
    a_s = jnp.where(jnp.abs(a) < 1e-9, 1e-9, a)
    t_cyl = (-b - jnp.sqrt(jnp.maximum(h, 0.0))) / a_s
    y = baoa + t_cyl * bard
    cyl_ok = (h > 0) & (y > 0) & (y < baba) & (t_cyl > 1e-4)
    t_cyl = jnp.where(cyl_ok, t_cyl, _INF)
    # end caps
    pb = v3.add(pa, ba)
    t_ca, n_ca = _isect_sphere(o, d, pa, r)
    t_cb, n_cb = _isect_sphere(o, d, pb, r)
    cap_first = t_ca < t_cb
    t_cap = jnp.minimum(t_ca, t_cb)
    n_cap = v3.where(cap_first, n_ca, n_cb)
    t = jnp.minimum(t_cyl, t_cap)
    # cylinder-wall normal: radial from the axis
    hit = v3.add(o, v3.scale(d, t))
    s_ax = v3.dot(v3.sub(hit, pa), ba) / baba
    proj = v3.add(pa, v3.scale(ba, s_ax))
    n_cyl = v3.scale(v3.sub(hit, proj), 1.0 / r)
    normal = v3.where(t_cyl <= t_cap, n_cyl, n_cap)
    return t, normal


def _isect_box(o, d, axes, p0, size):
    """Slab method; axes = (ex, ey, ez) box basis (vec3 of scalars)."""
    rel = v3.sub(o, p0)
    tmin = jnp.full_like(d[0], -_INF)
    tmax = jnp.full_like(d[0], _INF)
    n_x = jnp.zeros_like(d[0])
    n_y = jnp.zeros_like(d[0])
    n_z = jnp.zeros_like(d[0])
    for k in range(3):
        ax = axes[k]
        ol = v3.dot(rel, ax)
        dl = v3.dot(d, ax)
        dl_s = jnp.where(jnp.abs(dl) < 1e-9, 1e-9, dl)
        t1 = (-size[k] - ol) / dl_s
        t2 = (size[k] - ol) / dl_s
        tlo = jnp.minimum(t1, t2)
        thi = jnp.maximum(t1, t2)
        enters = tlo > tmin
        sign = -jnp.sign(dl_s)
        n_x = jnp.where(enters, ax[0] * sign, n_x)
        n_y = jnp.where(enters, ax[1] * sign, n_y)
        n_z = jnp.where(enters, ax[2] * sign, n_z)
        tmin = jnp.maximum(tmin, tlo)
        tmax = jnp.minimum(tmax, thi)
    valid = (tmax > tmin) & (tmin > 1e-4)
    return jnp.where(valid, tmin, _INF), (n_x, n_y, n_z)


# ------------------------------------------------------------------ shading
def _checker_rgb(lx, ly, rgb1, rgb2, markrgb):
    """MuJoCo builtin=checker with mark=edge, ~0.5 m squares (texuniform).
    rgb1/rgb2/markrgb: vec3 tuples (scalars or arrays) — shared by the jnp
    path (from an Appearance) and the Pallas kernel (from SMEM scalars)."""
    cell = 0.5
    u = lx / cell
    w = ly / cell
    iu = jnp.floor(u)
    iw = jnp.floor(w)
    par = jnp.mod(iu + iw, 2.0) > 0.5
    base = v3.where(par, rgb2, rgb1)
    fu = u - iu
    fw = w - iw
    edge = (fu < 0.06) | (fw < 0.06) | (fu > 0.94) | (fw > 0.94)
    return v3.where(edge, markrgb, base)


def _checker_color(lx, ly, app: Appearance):
    return _checker_rgb(lx, ly, v3.unstack(app.grid_rgb1, 0),
                        v3.unstack(app.grid_rgb2, 0),
                        v3.unstack(app.grid_markrgb, 0))


def _sky_rgb(d, rgb, rgb2):
    """builtin=gradient skybox: rgb up → rgb2 down (vec3 tuples)."""
    s = jnp.clip(d[2] * 0.5 + 0.5, 0.0, 1.0)
    return v3.lerp(rgb2, rgb, s)


def _sky_color(d, app: Appearance):
    return _sky_rgb(d, v3.unstack(app.skybox_rgb, 0),
                    v3.unstack(app.skybox_rgb2, 0))


def _trace_geom(g, o, d, p0, ex, ey, ez, col, plane_color_fn=None):
    """Closest-hit of rays (o, d) against one static geom `g` posed at
    (p0; ex/ey/ez basis columns). Returns (t, n, col) — all vec3/array
    shapes follow d's components. `plane_color_fn(lx, ly, hit)` overrides
    the color for plane geoms (checker/texture). Shared by the jnp path and
    the Pallas kernel so both trace identical math."""
    if g.gtype == PLANE:
        t, (lx, ly), hit = _isect_plane(o, d, ez, p0, ex, ey, g.size)
        n = ez
        if plane_color_fn is not None:
            col = plane_color_fn(lx, ly, hit)
    elif g.gtype == SPHERE:
        t, n = _isect_sphere(o, d, p0, float(g.size[0]))
    elif g.gtype in (CAPSULE, CYLINDER):
        hl = float(g.size[1])
        pa = v3.sub(p0, v3.scale(ez, hl))
        ba = v3.scale(ez, 2 * hl)
        t, n = _isect_capsule(o, d, pa, ba, (2 * hl) ** 2, float(g.size[0]))
    elif g.gtype == BOX:
        t, n = _isect_box(o, d, (ex, ey, ez), p0, g.size)
    elif g.gtype == ELLIPSOID:
        # scale space so the ellipsoid is a unit sphere
        s = np.asarray(g.size) + 1e-9
        rel = v3.sub(o, p0)
        o_s = (v3.dot(rel, ex) / s[0], v3.dot(rel, ey) / s[1],
               v3.dot(rel, ez) / s[2])
        d_s = (v3.dot(d, ex) / s[0], v3.dot(d, ey) / s[1],
               v3.dot(d, ez) / s[2])
        d_su, nrm = v3.normalize(d_s)
        zero3 = (jnp.float32(0),) * 3
        t, n_s = _isect_sphere(o_s, d_su, zero3, 1.0)
        t = t / nrm
        # local normal components / size, back to world
        nx, ny, nz = n_s[0] / s[0], n_s[1] / s[1], n_s[2] / s[2]
        n = v3.add(v3.add(v3.scale(ex, nx), v3.scale(ey, ny)),
                   v3.scale(ez, nz))
        n, _ = v3.normalize(n)
    else:
        return None
    return t, n, col


def _trace_hfield(model: Model, hfield, o, d):
    """Closest hit of rays against the heightfield terrain: slab-clip to
    the terrain AABB, then fixed-step ray march + bisection
    (physics/hfield.py). Returns (t with _INF misses, normal)."""
    from sgqn_carla_tpu.physics import hfield as hf

    g = model.geoms[model.hfield_geom]
    half = float(g.size[0])
    z0 = float(g.pos[2])
    zmax = z0 + float(g.size[2]) + 0.01
    t_lo = jnp.zeros_like(d[0])
    t_hi = jnp.full_like(d[0], 4.0 * half)
    for oc, dc, lo, hi in ((o[0], d[0], -half, half),
                           (o[1], d[1], -half, half),
                           (o[2], d[2], z0 - 0.2, zmax)):
        inv = 1.0 / jnp.where(jnp.abs(dc) < 1e-9, 1e-9, dc)
        ta = (lo - oc) * inv
        tb = (hi - oc) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(ta, tb))
        t_hi = jnp.minimum(t_hi, jnp.maximum(ta, tb))
    valid = t_hi > jnp.maximum(t_lo, 0.0)
    t_lo = jnp.maximum(t_lo, 1e-4)
    t, n, hit = hf.raycast_segment(
        hfield, o, d, t_lo, jnp.maximum(t_hi, t_lo + 1e-3),
        half=half, z0=z0)
    t = jnp.where(hit & valid, t, _INF)
    return t, n


def render_scene(
    model: Model,
    Rg: jnp.ndarray,          # (ngeom, 3, 3) world geom rotations
    pg: jnp.ndarray,          # (ngeom, 3) world geom positions
    app: Appearance,
    camera: Camera,
    height: int,
    width: int,
    background: Optional[jnp.ndarray] = None,  # (H, W, 3) float [0,1]
    bg_mask_materials: Tuple[str, ...] = (),
    material_color_fns: Optional[dict] = None,  # name → fn(lx, ly, world_v3)
    hfield: Optional[jnp.ndarray] = None,  # per-episode terrain grid
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trace the scene. Returns (rgb uint8 (H,W,3), depth f32 (H,W),
    seg int32 (H,W); seg = closest geom index, -1 for sky).

    If `background` is given, sky pixels (and pixels hitting geoms whose
    material is in `bg_mask_materials`) are composited with it — the
    video_easy/video_hard mechanism."""
    f = jnp.float32
    P = height * width
    # pixel rays (components; pixel axis is the last/lane dim everywhere)
    tan_half = np.tan(np.deg2rad(camera.fovy) / 2)
    ys = (1.0 - 2.0 * (jnp.arange(height, dtype=f) + 0.5) / height) * tan_half
    xs = (2.0 * (jnp.arange(width, dtype=f) + 0.5) / width - 1.0) * tan_half * (
        width / height)
    cx = jnp.broadcast_to(xs[None, :], (height, width)).reshape(P)
    cy = jnp.broadcast_to(ys[:, None], (height, width)).reshape(P)
    R = camera.R
    dx = R[0, 0] * cx + R[0, 1] * cy - R[0, 2]
    dy = R[1, 0] * cx + R[1, 1] * cy - R[1, 2]
    dz = R[2, 0] * cx + R[2, 1] * cy - R[2, 2]
    d, _ = v3.normalize((dx, dy, dz))
    o = (camera.pos[0].astype(f), camera.pos[1].astype(f),
         camera.pos[2].astype(f))

    # running closest-hit state (gather-free where-chain)
    t_min = jnp.full((P,), _INF, f)
    n_min = (jnp.zeros((P,), f),) * 3
    c_min = (jnp.zeros((P,), f),) * 3
    seg = jnp.full((P,), -1, jnp.int32)

    for i, g in enumerate(model.geoms):
        if g.group > 2 or g.rgba[3] == 0.0:
            continue
        Ri, pi = Rg[i].astype(f), pg[i].astype(f)
        p0 = (pi[0], pi[1], pi[2])
        ex = (Ri[0, 0], Ri[1, 0], Ri[2, 0])
        ey = (Ri[0, 1], Ri[1, 1], Ri[2, 1])
        ez = (Ri[0, 2], Ri[1, 2], Ri[2, 2])
        base = app.geom_rgba[i]
        col = (base[0], base[1], base[2])
        if g.gtype == PLANE and material_color_fns and g.material in material_color_fns:
            plane_fn = material_color_fns[g.material]
        elif g.gtype == PLANE and g.material == "grid":
            plane_fn = lambda lx, ly, hit: _checker_color(lx, ly, app)
        else:
            plane_fn = None
        traced = _trace_geom(g, o, d, p0, ex, ey, ez, col, plane_fn)
        if traced is None:
            continue
        t, n, col = traced
        closer = t < t_min
        t_min = jnp.where(closer, t, t_min)
        n_min = v3.where(closer, n if isinstance(n, tuple) else n, n_min)
        c_min = v3.where(closer, col, c_min)
        seg = jnp.where(closer, i, seg)

    if hfield is not None and model.hfield_geom >= 0:
        t, n = _trace_hfield(model, hfield, o, d)
        base = app.geom_rgba[model.hfield_geom]
        closer = t < t_min
        t_min = jnp.where(closer, t, t_min)
        n_min = v3.where(closer, n, n_min)
        c_min = v3.where(closer, (base[0], base[1], base[2]), c_min)
        seg = jnp.where(closer, model.hfield_geom, seg)

    hit = t_min < _INF * 0.5

    # headlight shading (reference: common/visual.xml — ambient .4 diffuse .8)
    ndotl = jnp.maximum(-v3.dot(n_min, d), 0.0)
    shade = jnp.clip(0.4 + 0.8 * ndotl, 0.0, 1.3)
    rgb = v3.scale(c_min, shade)

    sky = _sky_color(d, app)
    rgb = v3.where(hit, rgb, sky)
    seg = jnp.where(hit, seg, -1)

    if background is not None:
        bgf = background.astype(f).reshape(P, 3)
        bg = (bgf[:, 0], bgf[:, 1], bgf[:, 2])
        bg_mask = ~hit
        if bg_mask_materials:
            for gid, g in enumerate(model.geoms):
                if g.material in bg_mask_materials:
                    bg_mask = bg_mask | (seg == gid)
        rgb = v3.where(bg_mask, bg, rgb)

    rgb8 = jnp.clip(v3.stack(rgb) * 255.0, 0, 255).astype(jnp.uint8)
    return (
        rgb8.reshape(height, width, 3),
        t_min.reshape(height, width),
        seg.reshape(height, width),
    )


def render(model: Model, kin, app: Appearance, camera: Camera,
           height: int, width: int, **kw):
    """Convenience: render from forward-kinematics caches."""
    from sgqn_carla_tpu.physics.engine import geom_world

    Rg, pg = geom_world(model, kin)
    return render_scene(model, Rg, pg, app, camera, height, width, **kw)
