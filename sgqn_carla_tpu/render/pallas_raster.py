"""Pallas tile-based rasterizer: the TPU-kernel fast path of the renderer.

TPU-native replacement for the reference's OpenGL rasterization stack
(reference: src/env/dm_control/dm_control/_render/__init__.py:17-53,
mujoco/engine.py:684-762 `Camera.render`), executing SURVEY §7 build step 3
("Pallas rasterizer"). The jnp path in `render/raster.py` traces the same
math through XLA fusion; this kernel removes the remaining HBM round-trips
by keeping the whole per-ray pipeline — ray generation → per-geom
closest-hit chain → shading → sky — inside VMEM for a tile of rays.

Layout: rays are flattened to (ROWS, 128) f32 tiles (lane dim = 128, full
VPU width). The grid is (num_envs, ray_tiles); each cell traces TILE_ROWS
× 128 rays of one env. Per-env scene parameters (camera pose, geom poses,
colors) are packed into one f32 vector per env and read as SMEM scalars, so
geom data never occupies vector lanes. The static geom list (types, sizes,
materials) unrolls at trace time — same as the jnp path — and the geometry
math is literally shared (`raster._trace_geom`): both backends trace
identical images by construction (asserted by tests/test_render.py).

Per-tile geom culling: for each non-plane geom the kernel computes a
conservative screen-row interval from its bounding sphere (scalar math on
SMEM values) and skips the whole intersection block when the tile's ray
rows cannot overlap it (`@pl.when`). With 8-row tiles this skips most
capsule work for the ~80% of tiles a limb does not cross.

Outputs: rgb f32 (E, 3, H*W rays padded) in [0,1] and seg i32 — background
compositing (video modes) and uint8 quantization happen outside the kernel
(cheap elementwise XLA ops); masks derive from seg exactly as in the jnp
path, replacing the reference's HSV chroma-key greenscreen
(env/wrappers.py:390-420).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgqn_carla_tpu.ops import v3
from sgqn_carla_tpu.physics.model import PLANE, Model
from sgqn_carla_tpu.render import raster

_INF = raster._INF

# rows of 128 rays per grid cell. 8 rows = 1024 rays ≈ 12 pixel rows at
# W=84 — small enough that per-tile geom culling pays, large enough that
# per-cell overhead does not.
import os
TILE_ROWS = int(os.environ.get("SGQN_RENDER_TILE_ROWS", "8"))


def _bounding_radius(g) -> float:
    """Conservative world-space bounding-sphere radius of a geom."""
    s = np.asarray(g.size, np.float64)
    return float(np.sqrt((s * s).sum()) + 1e-3)


def _pack_params(Rg, pg, app, cam_pos, cam_R):
    """Pack per-env dynamic scene state into one (E, PDIM) f32 array.

    Layout: cam_pos(3) cam_R(9 row-major) Rg(G*9 row-major) pg(G*3)
            rgba(G*4) grid_rgb1(3) grid_rgb2(3) grid_mark(3) sky(3) sky2(3).
    """
    E, G = Rg.shape[0], Rg.shape[1]
    f = jnp.float32
    parts = [
        cam_pos.reshape(E, 3).astype(f),
        cam_R.reshape(E, 9).astype(f),
        Rg.reshape(E, G * 9).astype(f),
        pg.reshape(E, G * 3).astype(f),
        app.geom_rgba.reshape(E, G * 4).astype(f),
        app.grid_rgb1.reshape(E, 3).astype(f),
        app.grid_rgb2.reshape(E, 3).astype(f),
        app.grid_markrgb.reshape(E, 3).astype(f),
        app.skybox_rgb.reshape(E, 3).astype(f),
        app.skybox_rgb2.reshape(E, 3).astype(f),
    ]
    return jnp.concatenate(parts, axis=1)


def _offsets(G: int):
    o_cam_pos = 0
    o_cam_R = 3
    o_Rg = 12
    o_pg = o_Rg + 9 * G
    o_rgba = o_pg + 3 * G
    o_grid1 = o_rgba + 4 * G
    return dict(cam_pos=o_cam_pos, cam_R=o_cam_R, Rg=o_Rg, pg=o_pg,
                rgba=o_rgba, grid1=o_grid1, grid2=o_grid1 + 3,
                mark=o_grid1 + 6, sky=o_grid1 + 9, sky2=o_grid1 + 12,
                pdim=o_grid1 + 15)


def _make_kernel(model: Model, H: int, W: int, fovy: float):
    """Build the kernel body for one (model, resolution, fov)."""
    G = len(model.geoms)
    off = _offsets(G)
    tan_half = float(np.tan(np.deg2rad(fovy) / 2))
    aspect = W / H
    P = H * W
    f = jnp.float32

    geoms = [(i, g) for i, g in enumerate(model.geoms)
             if g.group <= 2 and g.rgba[3] != 0.0]

    def kernel(p_ref, rgb_ref, seg_ref):
        t_tile = pl.program_id(1)
        sc = lambda k: p_ref[0, 0, k]

        # ---- ray directions for this tile
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        idx = (t_tile * TILE_ROWS + row) * 128 + col
        px = (idx % W).astype(f)
        py = (idx // W).astype(f)  # padding rays (idx >= P) fall off-image;
        # they render sky and are sliced away outside the kernel
        cx = (2.0 * (px + 0.5) / W - 1.0) * (tan_half * aspect)
        cy = (1.0 - 2.0 * (py + 0.5) / H) * tan_half
        R = [sc(off["cam_R"] + k) for k in range(9)]
        d_raw = (R[0] * cx + R[1] * cy - R[2],
                 R[3] * cx + R[4] * cy - R[5],
                 R[6] * cx + R[7] * cy - R[8])
        d, _ = v3.normalize(d_raw)
        o = (sc(off["cam_pos"]), sc(off["cam_pos"] + 1),
             sc(off["cam_pos"] + 2))

        # tile's pixel-row interval (for geom culling)
        tile_row_lo = (t_tile * TILE_ROWS * 128) // W
        tile_row_hi = ((t_tile + 1) * TILE_ROWS * 128 - 1) // W

        t_min = jnp.full((TILE_ROWS, 128), _INF, f)
        n_min = (jnp.zeros((TILE_ROWS, 128), f),) * 3
        c_min = (jnp.zeros((TILE_ROWS, 128), f),) * 3
        seg = jnp.full((TILE_ROWS, 128), -1, jnp.int32)

        state = [t_min, n_min, c_min, seg]

        for i, g in geoms:
            Rb = off["Rg"] + 9 * i
            Rv = [sc(Rb + k) for k in range(9)]
            pb = off["pg"] + 3 * i
            p0 = (sc(pb), sc(pb + 1), sc(pb + 2))
            ex = (Rv[0], Rv[3], Rv[6])
            ey = (Rv[1], Rv[4], Rv[7])
            ez = (Rv[2], Rv[5], Rv[8])
            cb = off["rgba"] + 4 * i
            col_g = (sc(cb), sc(cb + 1), sc(cb + 2))
            if g.gtype == PLANE and g.material == "grid":
                g1 = (sc(off["grid1"]), sc(off["grid1"] + 1), sc(off["grid1"] + 2))
                g2 = (sc(off["grid2"]), sc(off["grid2"] + 1), sc(off["grid2"] + 2))
                gm = (sc(off["mark"]), sc(off["mark"] + 1), sc(off["mark"] + 2))
                plane_fn = lambda lx, ly, hit, g1=g1, g2=g2, gm=gm: (
                    raster._checker_rgb(lx, ly, g1, g2, gm))
            else:
                plane_fn = None

            def trace(st, g=g, o=o, d=d, p0=p0, ex=ex, ey=ey, ez=ez,
                      col_g=col_g, plane_fn=plane_fn, gi=i):
                t_min, n_min, c_min, seg = st
                traced = raster._trace_geom(g, o, d, p0, ex, ey, ez, col_g,
                                            plane_fn)
                t, n, col = traced
                closer = t < t_min
                return [jnp.where(closer, t, t_min),
                        v3.where(closer, n, n_min),
                        v3.where(closer, col, c_min),
                        jnp.where(closer, gi, seg)]

            if g.gtype == PLANE:
                state = trace(state)  # planes span the screen; never cull
                continue

            # ---- conservative screen-row culling from the bounding sphere
            rb = _bounding_radius(g)
            rel = v3.sub(p0, o)
            # camera-frame coords: z along -view = distance in front
            vz = -(R[2] * rel[0] + R[5] * rel[1] + R[8] * rel[2])
            vy = R[1] * rel[0] + R[4] * rel[1] + R[7] * rel[2]
            near = vz <= rb + 1e-3  # behind/straddling camera: no culling
            vz_s = jnp.maximum(vz, 1e-3)
            # vertical angle interval → pixel rows (y down)
            yc = vy / vz_s
            yr = rb / vz_s * 1.4142  # slack for perspective distortion
            r_lo = (1.0 - (yc + yr) / tan_half) * 0.5 * H
            r_hi = (1.0 - (yc - yr) / tan_half) * 0.5 * H
            overlap = (r_hi >= tile_row_lo - 1) & (r_lo <= tile_row_hi + 1)
            state = jax.lax.cond(near | overlap, trace, lambda st: st, state)

        t_min, n_min, c_min, seg = state
        hit = t_min < _INF * 0.5

        # headlight shading (reference: common/visual.xml — ambient .4 diffuse .8)
        ndotl = jnp.maximum(-v3.dot(n_min, d), 0.0)
        shade = jnp.clip(0.4 + 0.8 * ndotl, 0.0, 1.3)
        rgb = v3.scale(c_min, shade)
        sky = raster._sky_rgb(
            d, (sc(off["sky"]), sc(off["sky"] + 1), sc(off["sky"] + 2)),
            (sc(off["sky2"]), sc(off["sky2"] + 1), sc(off["sky2"] + 2)))
        rgb = v3.where(hit, rgb, sky)
        seg = jnp.where(hit, seg, -1)

        rgb_ref[0, 0] = jnp.clip(rgb[0], 0.0, 1.0)
        rgb_ref[0, 1] = jnp.clip(rgb[1], 0.0, 1.0)
        rgb_ref[0, 2] = jnp.clip(rgb[2], 0.0, 1.0)
        seg_ref[0] = seg

    return kernel, off["pdim"]


_RENDERER_CACHE = {}


def _build_renderer(model: Model, H: int, W: int, fovy: float):
    """Trace-cached batched renderer for one (model, resolution, fov) —
    keyed by model identity (Model holds numpy arrays; unhashable).

    Returns fn(params (E, PDIM) f32) → (rgb f32 (E, 3, H, W) in [0,1],
    seg i32 (E, H, W))."""
    key = (id(model), H, W, fovy)
    if key in _RENDERER_CACHE:
        return _RENDERER_CACHE[key]
    kernel, pdim = _make_kernel(model, H, W, fovy)
    P = H * W
    rows = -(-P // 128)
    rows_pad = -(-rows // TILE_ROWS) * TILE_ROWS
    T = rows_pad // TILE_ROWS

    def render(params):
        E = params.shape[0]
        params3 = params.reshape(E, 1, -1)
        rgb, seg = pl.pallas_call(
            kernel,
            grid=(E, T),
            in_specs=[pl.BlockSpec((1, 1, pdim), lambda e, t: (e, 0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((1, 3, TILE_ROWS, 128),
                             lambda e, t: (e, 0, t, 0)),
                pl.BlockSpec((1, TILE_ROWS, 128), lambda e, t: (e, t, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((E, 3, rows_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((E, rows_pad, 128), jnp.int32),
            ),
        )(params3)
        rgb = rgb.reshape(E, 3, rows_pad * 128)[:, :, :P].reshape(E, 3, H, W)
        seg = seg.reshape(E, rows_pad * 128)[:, :P].reshape(E, H, W)
        return rgb, seg

    _RENDERER_CACHE[key] = render
    return render


def render_batch(model: Model, Rg, pg, app, cam_pos, cam_R, fovy: float,
                 H: int, W: int):
    """Trace a batch of scenes with the Pallas kernel.

    Rg: (E, G, 3, 3); pg: (E, G, 3); app: Appearance with (E, ...) leaves;
    cam_pos: (E, 3); cam_R: (E, 3, 3). Returns (rgb f32 (E,3,H,W) in [0,1],
    seg i32 (E,H,W))."""
    params = _pack_params(Rg, pg, app, cam_pos, cam_R)
    return _build_renderer(model, H, W, float(fovy))(params)


def use_pallas() -> bool:
    """The kernel path runs on TPU; CPU tests use the jnp path."""
    import os

    forced = os.environ.get("SGQN_FORCE_RENDERER", "")
    if forced == "pallas":
        return True
    if forced == "jnp":
        return False
    return jax.default_backend() == "tpu"
