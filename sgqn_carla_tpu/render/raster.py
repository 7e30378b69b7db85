"""On-device analytic ray-cast renderer: RGB + depth + segmentation.

TPU-native replacement for the reference's OpenGL stack (EGL/GLFW/OSMesa
contexts + `mjr_render`/`mjr_readPixels`, reference: src/env/dm_control/
dm_control/_render/__init__.py:17-53 and mujoco/engine.py:684-762). Instead
of rasterizing triangles on a GPU driver thread and reading pixels back to
the host, each pixel traces one analytic ray against the geom list entirely
in jnp:

  * primitives: plane (checker texture + edge marks), sphere, capsule,
    box, cylinder — the full set used by the DMC benchmark domains;
  * outputs the same rgb/depth/segmentation trio as `Camera.render`
    (engine.py:684-762). The segmentation channel gives *exact* background
    masks, replacing the reference's per-pixel HSV chroma-key greenscreen
    (env/wrappers.py:390-420) with a mechanism that cannot misclassify;
  * appearance (material colors, skybox gradient) is a dynamic `Appearance`
    pytree — the color benchmarks become array swaps instead of MJCF XML
    rewrites (reference: suite/common/settings.py:15-79);
  * everything is fused elementwise math over a (pixels, geoms) grid —
    ideal VPU work, vmapped over the env batch.

Per-geom loops unroll at trace time over the static geom list.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

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
def _isect_plane(o, d, Rg, pg, size):
    """Ray vs finite plane patch (local z up, half-extents size[:2])."""
    n = Rg[:, 2]
    denom = d @ n
    t = ((pg - o) @ n) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    hit_p = o + d * t[..., None]
    local = (hit_p - pg) @ Rg  # world→local
    inside = (jnp.abs(local[..., 0]) <= size[0]) & (jnp.abs(local[..., 1]) <= size[1])
    valid = (t > 1e-4) & inside & (denom < 0)  # front-face only
    normal = jnp.broadcast_to(n, d.shape)
    return jnp.where(valid, t, _INF), normal, local


def _isect_sphere(o, d, c, r):
    oc = o - c
    b = jnp.sum(d * oc, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    valid = (disc > 0) & (t > 1e-4)
    hit = o + d * t[..., None]
    normal = (hit - c) / r
    return jnp.where(valid, t, _INF), normal


def _isect_capsule(o, d, pa, pb, r):
    """Ray vs capsule with axis segment [pa, pb]."""
    ba = pb - pa
    baba = ba @ ba + 1e-12
    oa = o - pa
    bard = jnp.sum(d * ba, axis=-1)
    baoa = jnp.sum(oa * ba, axis=-1)
    rdoa = jnp.sum(d * oa, axis=-1)
    oaoa = jnp.sum(oa * oa, axis=-1)
    a = baba - bard * bard
    b = baba * rdoa - baoa * bard
    c = baba * oaoa - baoa * baoa - r * r * baba
    h = b * b - a * c
    a_safe = jnp.where(jnp.abs(a) < 1e-9, 1e-9, a)
    t_cyl = (-b - jnp.sqrt(jnp.maximum(h, 0.0))) / a_safe
    y = baoa + t_cyl * bard
    cyl_valid = (h > 0) & (y > 0) & (y < baba) & (t_cyl > 1e-4)
    # cap spheres
    t_ca, n_ca = _isect_sphere(o, d, pa, r)
    t_cb, n_cb = _isect_sphere(o, d, pb, r)
    t_cap = jnp.minimum(t_ca, t_cb)
    n_cap = jnp.where((t_ca < t_cb)[..., None], n_ca, n_cb)
    t_cyl_v = jnp.where(cyl_valid, t_cyl, _INF)
    t = jnp.minimum(t_cyl_v, t_cap)
    hit = o + d * t[..., None]
    # cylinder normal: radial from axis
    proj = pa + ba * (jnp.sum((hit - pa) * ba, axis=-1) / baba)[..., None]
    n_cyl = (hit - proj) / r
    normal = jnp.where((t_cyl_v <= t_cap)[..., None], n_cyl, n_cap)
    return t, normal


def _isect_box(o, d, Rg, pg, size):
    """Slab method in the box local frame."""
    ol = (o - pg) @ Rg
    dl = d @ Rg
    dl_safe = jnp.where(jnp.abs(dl) < 1e-9, 1e-9, dl)
    t1 = (-size - ol) / dl_safe
    t2 = (size - ol) / dl_safe
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    valid = (tmax > tmin) & (tmax > 1e-4) & (tmin > 1e-4)
    # face normal: axis of largest |local hit| ratio
    hit_l = ol + dl * tmin[..., None]
    ratio = hit_l / size
    axis = jnp.argmax(jnp.abs(ratio), axis=-1)
    sign = jnp.sign(jnp.take_along_axis(ratio, axis[..., None], axis=-1))[..., 0]
    n_local = jax.nn.one_hot(axis, 3) * sign[..., None]
    normal = n_local @ Rg.T
    return jnp.where(valid, tmin, _INF), normal


# ------------------------------------------------------------------ shading
def _checker_color(local_xy, app: Appearance):
    """MuJoCo builtin=checker with mark=edge, ~0.5 m squares (texuniform)."""
    cell = 0.5
    u = local_xy[..., 0] / cell
    v = local_xy[..., 1] / cell
    iu = jnp.floor(u)
    iv = jnp.floor(v)
    par = jnp.mod(iu + iv, 2.0)
    base = jnp.where(par[..., None] > 0.5, app.grid_rgb2, app.grid_rgb1)
    fu = u - iu
    fv = v - iv
    edge = (fu < 0.06) | (fv < 0.06) | (fu > 0.94) | (fv > 0.94)
    return jnp.where(edge[..., None], app.grid_markrgb, base)


def _sky_color(d, app: Appearance):
    """builtin=gradient skybox: rgb1 up → rgb2 down."""
    s = jnp.clip(d[..., 2] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    return app.skybox_rgb * s + app.skybox_rgb2 * (1.0 - s)


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
    material_color_fns: Optional[dict] = None,  # name → fn(local_xy, world_p)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trace the scene. Returns (rgb uint8 (H,W,3), depth f32, seg int32).

    seg = geom index of the closest hit, -1 for sky — the segmentation
    output of the reference's `Camera.render(segmentation=True)`
    (engine.py:684-762). If `background` is given, sky pixels (and pixels
    hitting geoms whose material is in `bg_mask_materials`) are composited
    with it — the video_easy/video_hard mechanism.
    """
    f = jnp.float32
    # pixel rays
    tan_half = np.tan(np.deg2rad(camera.fovy) / 2)
    ys = (1.0 - 2.0 * (jnp.arange(height, dtype=f) + 0.5) / height) * tan_half
    xs = (2.0 * (jnp.arange(width, dtype=f) + 0.5) / width - 1.0) * tan_half * (
        width / height
    )
    dir_cam = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (height, width)),
            jnp.broadcast_to(ys[:, None], (height, width)),
            -jnp.ones((height, width), f),
        ],
        axis=-1,
    )
    d = dir_cam @ camera.R.T
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d.reshape(-1, 3)
    o = camera.pos.astype(f)

    # running closest-hit state (gather-free: TPU hates argmin+gather over a
    # stacked (G, P) tensor; a where-chain over the static geom list fuses
    # into pure elementwise VPU work instead)
    t_min = jnp.full(d.shape[:1], _INF, f)
    n_min = jnp.zeros_like(d)
    c_min = jnp.zeros_like(d)
    seg = jnp.full(d.shape[:1], -1, jnp.int32)

    for i, g in enumerate(model.geoms):
        if g.group > 2 or g.rgba[3] == 0.0:
            continue
        size = jnp.asarray(g.size, f)
        R_i, p_i = Rg[i].astype(f), pg[i].astype(f)
        base_rgb = app.geom_rgba[i, :3]
        if g.gtype == PLANE:
            t, n, local = _isect_plane(o, d, R_i, p_i, g.size)
            if material_color_fns and g.material in material_color_fns:
                hit_p = o + d * t[..., None]
                col = material_color_fns[g.material](local, hit_p)
            elif g.material == "grid":
                col = _checker_color(local, app)
            else:
                col = jnp.broadcast_to(base_rgb, d.shape)
        elif g.gtype == SPHERE:
            t, n = _isect_sphere(o, d, p_i, float(g.size[0]))
            col = jnp.broadcast_to(base_rgb, d.shape)
        elif g.gtype in (CAPSULE, CYLINDER):
            hl = float(g.size[1])
            axis = R_i[:, 2]
            t, n = _isect_capsule(o, d, p_i - axis * hl, p_i + axis * hl,
                                  float(g.size[0]))
            col = jnp.broadcast_to(base_rgb, d.shape)
        elif g.gtype == BOX:
            t, n = _isect_box(o, d, R_i, p_i, size)
            col = jnp.broadcast_to(base_rgb, d.shape)
        elif g.gtype == ELLIPSOID:
            # scale space so the ellipsoid is a unit sphere
            s = size + 1e-9
            o_s = ((o - p_i) @ R_i) / s
            d_s = (d @ R_i) / s
            nrm = jnp.linalg.norm(d_s, axis=-1, keepdims=True)
            t, n_s = _isect_sphere(o_s, d_s / nrm, jnp.zeros(3, f), 1.0)
            t = t / nrm[..., 0]
            n = (n_s / s) @ R_i.T
            n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
            col = jnp.broadcast_to(base_rgb, d.shape)
        else:
            continue
        # gather-free closest-hit update: a where-chain over the static geom
        # list fuses into elementwise VPU work (argmin + take_along_axis
        # gathers over a stacked (G, P) tensor are pathological on TPU)
        closer = t < t_min
        t_min = jnp.where(closer, t, t_min)
        n_min = jnp.where(closer[..., None], n, n_min)
        c_min = jnp.where(closer[..., None], col, c_min)
        seg = jnp.where(closer, i, seg)

    hit = t_min < _INF * 0.5

    # headlight shading (reference: common/visual.xml — ambient .4 diffuse .8)
    ndotl = jnp.maximum(-jnp.sum(n_min * d, axis=-1), 0.0)
    shade = jnp.clip(0.4 + 0.8 * ndotl, 0.0, 1.3)[..., None]
    rgb = c_min * shade

    sky = _sky_color(d, app)
    rgb = jnp.where(hit[..., None], rgb, sky)
    seg = jnp.where(hit, seg, -1)

    if background is not None:
        bg = background.reshape(-1, 3).astype(f)
        bg_mask = ~hit
        if bg_mask_materials:
            for gid, g in enumerate(model.geoms):
                if g.material in bg_mask_materials:
                    bg_mask = bg_mask | (seg == gid)
        rgb = jnp.where(bg_mask[..., None], bg, rgb)

    rgb8 = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
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
