"""Grouped / deferred-shading renderer: the production fast path.

Same capability as `raster.render_scene` (the readable reference path —
reference: dm_control mujoco/engine.py:684-762 `Camera.render` rgb/depth/
segmentation trio), restructured for TPU throughput:

  * **grouped primitives**: all capsules/cylinders trace as one (Gc, P)
    batch and all spheres as one (Gs, P) batch, instead of Gc+Gs separate
    unrolled where-chains. The ray-direction dot products become two small
    matmuls `(G,3) @ (3,P)` that XLA places on the MXU; the remaining
    per-ray-geom work is short f32 VPU chains over (G, P);
  * **shared ray origin**: every per-geom quantity that depends only on the
    camera origin (|oa|², ba·oa, the cap-sphere c terms) is computed once
    per geom as a (G,1) column, not per pixel;
  * **deferred shading**: the grouped pass computes only hit distances.
    Normals and colors are evaluated once, for the winning geom per pixel
    (gathers over the tiny per-geom parameter rows) — the reference-path
    cost of computing normals for every geom at every pixel is gone.
    A capsule normal needs no cap/wall split: it is (hit − clamp-projected
    axis point)/r for both;
  * planes / boxes / ellipsoids (≤2 per DMC scene) keep the reference
    per-geom path.

Outputs match `render_scene` (uint8 rgb, f32 depth, i32 seg) to within
float-association differences; tests/test_render.py asserts agreement.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.ops import v3
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, CYLINDER, ELLIPSOID, PLANE, SPHERE, Model,
)
from sgqn_carla_tpu.render import raster
from sgqn_carla_tpu.render.raster import Appearance, Camera, _INF


def _mm(A, B):
    """(G,3)·(3,P) dot as broadcast multiply-adds. K=3 / G≤8 matmuls pad
    catastrophically on the 128×128 MXU (and batched-under-vmap they force
    HBM materialization of both operands, breaking elementwise fusion);
    three fused VPU FMAs are faster and keep full f32 precision."""
    return (A[:, 0:1] * B[0][None, :] + A[:, 1:2] * B[1][None, :]
            + A[:, 2:3] * B[2][None, :])


def _take_sel(arr, idx, G):
    """Gather from a tiny (G,) parameter row by per-pixel winner index as
    an unrolled select chain — TPU lowers real gathers catastrophically
    (~100× slower here)."""
    out = jnp.broadcast_to(arr[0], idx.shape)
    for g in range(1, G):
        out = jnp.where(idx == g, arr[g], out)
    return out


def _visible(g) -> bool:
    return g.group <= 2 and g.rgba[3] != 0.0


def render_scene_fast(
    model: Model,
    Rg: jnp.ndarray,
    pg: jnp.ndarray,
    app: Appearance,
    camera: Camera,
    height: int,
    width: int,
    background: Optional[jnp.ndarray] = None,
    bg_mask_materials: Tuple[str, ...] = (),
    material_color_fns: Optional[dict] = None,
    hfield: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for `raster.render_scene` (same signature)."""
    f = jnp.float32
    P = height * width
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
    D = jnp.stack(d, 0)                      # (3, P) for the MXU dots
    o_col = jnp.stack(o).reshape(1, 3)       # (1, 3)

    cap_ids = [i for i, g in enumerate(model.geoms)
               if _visible(g) and g.gtype in (CAPSULE, CYLINDER)]
    sph_ids = [i for i, g in enumerate(model.geoms)
               if _visible(g) and g.gtype == SPHERE]
    other_ids = [i for i, g in enumerate(model.geoms)
                 if _visible(g) and g.gtype in (PLANE, BOX, ELLIPSOID)]

    # ---------------- reference path for the few non-rounded geoms
    t_min = jnp.full((P,), _INF, f)
    n_min = (jnp.zeros((P,), f),) * 3
    c_min = (jnp.zeros((P,), f),) * 3
    seg = jnp.full((P,), -1, jnp.int32)
    for i in other_ids:
        g = model.geoms[i]
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
            plane_fn = lambda lx, ly, hit: raster._checker_color(lx, ly, app)
        else:
            plane_fn = None
        t, n, col = raster._trace_geom(g, o, d, p0, ex, ey, ez, col, plane_fn)
        closer = t < t_min
        t_min = jnp.where(closer, t, t_min)
        n_min = v3.where(closer, n, n_min)
        c_min = v3.where(closer, col, c_min)
        seg = jnp.where(closer, i, seg)

    # ---------------- heightfield terrain (escape): ray-march pass
    if hfield is not None and model.hfield_geom >= 0:
        t, n = raster._trace_hfield(model, hfield, o, d)
        base = app.geom_rgba[model.hfield_geom]
        closer = t < t_min
        t_min = jnp.where(closer, t, t_min)
        n_min = v3.where(closer, n, n_min)
        c_min = v3.where(closer, (base[0], base[1], base[2]), c_min)
        seg = jnp.where(closer, model.hfield_geom, seg)

    # ---------------- grouped capsules/cylinders: hit distances only
    if cap_ids:
        hl = jnp.asarray([float(model.geoms[i].size[1]) for i in cap_ids], f)
        r = jnp.asarray([float(model.geoms[i].size[0]) for i in cap_ids], f)
        EZ = Rg[jnp.asarray(cap_ids)][:, :, 2].astype(f)     # (Gc, 3)
        PC = pg[jnp.asarray(cap_ids)].astype(f)              # (Gc, 3)
        PA = PC - hl[:, None] * EZ                           # (Gc, 3)
        BA = 2.0 * hl[:, None] * EZ                          # (Gc, 3)
        baba = (4.0 * hl * hl)[:, None]                      # (Gc, 1)
        r2 = (r * r)[:, None]
        OA = o_col - PA                                      # (Gc, 3)
        bard = _mm(BA, D)                                    # (Gc, P)  MXU
        rdoa = _mm(OA, D)                                    # (Gc, P)  MXU
        baoa = jnp.sum(OA * BA, 1, keepdims=True)            # (Gc, 1)
        oaoa = jnp.sum(OA * OA, 1, keepdims=True)
        a = baba - bard * bard
        b = baba * rdoa - baoa * bard
        c = baba * oaoa - baoa * baoa - r2 * baba            # (Gc, 1)
        h = b * b - a * c
        a_s = jnp.maximum(a, 1e-9)  # a ≥ 0 analytically (Cauchy–Schwarz)
        t_cyl = (-b - jnp.sqrt(jnp.maximum(h, 0.0))) / a_s
        y = baoa + t_cyl * bard
        cyl_ok = (y > 0) & (y < baba) & (t_cyl > 1e-4)
        # one-cap trick: the cap spheres lie inside the infinite cylinder,
        # so h ≤ 0 (ray misses the infinite cylinder) ⇒ ray misses the whole
        # capsule; and when the cylinder root's axis parameter y falls
        # outside [0, |ba|²], only the cap on that side can be hit — test a
        # single sphere selected per pixel instead of both end caps.
        use_b = y >= baba
        b_s = jnp.where(use_b, rdoa - bard, rdoa)
        c_s = jnp.where(use_b, oaoa - 2.0 * baoa + baba - r2, oaoa - r2)
        disc = b_s * b_s - c_s
        t_cap = -b_s - jnp.sqrt(jnp.maximum(disc, 0.0))
        cap_ok = (disc > 0) & (t_cap > 1e-4)
        t_g = jnp.where(cyl_ok, t_cyl, jnp.where(cap_ok, t_cap, _INF))
        t_g = jnp.where(h > 0, t_g, _INF)                    # (Gc, P)

        t_c = jnp.min(t_g, axis=0)                           # (P,)
        idx = jnp.argmin(t_g, axis=0)                        # (P,)
        closer = t_c < t_min
        # deferred normal: (hit − clamped axis projection)/r covers both
        # the cylinder wall and the end caps
        take = lambda arr: _take_sel(arr, idx, len(cap_ids))
        hitp = v3.add(o, v3.scale(d, t_c))
        pa_w = (take(PA[:, 0]), take(PA[:, 1]), take(PA[:, 2]))
        ba_w = (take(BA[:, 0]), take(BA[:, 1]), take(BA[:, 2]))
        baba_w = take(baba[:, 0])
        s_ax = jnp.clip(v3.dot(v3.sub(hitp, pa_w), ba_w), 0.0, baba_w)
        proj = v3.add(pa_w, v3.scale(ba_w, s_ax / baba_w))
        n_c = v3.scale(v3.sub(hitp, proj), 1.0 / take(r))
        rgba_c = app.geom_rgba[jnp.asarray(cap_ids)]          # (Gc, 4)
        col_c = (take(rgba_c[:, 0]), take(rgba_c[:, 1]), take(rgba_c[:, 2]))
        seg_c = _take_sel(jnp.asarray(cap_ids, jnp.int32), idx,
                          len(cap_ids))
        t_min = jnp.where(closer, t_c, t_min)
        n_min = v3.where(closer, n_c, n_min)
        c_min = v3.where(closer, col_c, c_min)
        seg = jnp.where(closer, seg_c, seg)

    # ---------------- grouped spheres
    if sph_ids:
        r = jnp.asarray([float(model.geoms[i].size[0]) for i in sph_ids], f)
        C = pg[jnp.asarray(sph_ids)].astype(f)               # (Gs, 3)
        OC = o_col - C                                       # (Gs, 3)
        b = _mm(OC, D)                                       # (Gs, P)  MXU
        cc = jnp.sum(OC * OC, 1, keepdims=True) - (r * r)[:, None]
        disc = b * b - cc
        t_s = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        t_s = jnp.where((disc > 0) & (t_s > 1e-4), t_s, _INF)
        t_c = jnp.min(t_s, axis=0)
        idx = jnp.argmin(t_s, axis=0)
        closer = t_c < t_min
        take = lambda arr: _take_sel(arr, idx, len(sph_ids))
        hitp = v3.add(o, v3.scale(d, t_c))
        c_w = (take(C[:, 0]), take(C[:, 1]), take(C[:, 2]))
        n_s = v3.scale(v3.sub(hitp, c_w), 1.0 / take(r))
        rgba_s = app.geom_rgba[jnp.asarray(sph_ids)]
        col_s = (take(rgba_s[:, 0]), take(rgba_s[:, 1]), take(rgba_s[:, 2]))
        seg_s = _take_sel(jnp.asarray(sph_ids, jnp.int32), idx,
                          len(sph_ids))
        t_min = jnp.where(closer, t_c, t_min)
        n_min = v3.where(closer, n_s, n_min)
        c_min = v3.where(closer, col_s, c_min)
        seg = jnp.where(closer, seg_s, seg)

    # ---------------- shading / sky / background (same as reference path)
    hit = t_min < _INF * 0.5
    ndotl = jnp.maximum(-v3.dot(n_min, d), 0.0)
    shade = jnp.clip(0.4 + 0.8 * ndotl, 0.0, 1.3)
    rgb = v3.scale(c_min, shade)
    sky = raster._sky_color(d, app)
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
