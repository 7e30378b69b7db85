"""Color randomization tables for the color_easy / color_hard benchmarks.

The reference ships 100 pre-sampled color dicts per difficulty as opaque
`color_{easy,hard}.pt` pickles fetched by a setup script (reference:
env/wrappers.py:117-123, setup/prepare_dm_control_xp.sh) and applies one per
episode by re-writing MJCF XML (wrappers.py:89-139). Here the tables are
generated procedurally, anchored at the scene defaults — easy: defaults
perturbed uniformly by ±0.1 per channel; hard: ±0.5 (clipped) — and an
episode reset is just an `Appearance` array swap.

Calibration note (round-3 fix): hard was originally fully-uniform [0,1]
colors, which routinely sampled the body within a few percent of the floor
color — camouflage frames no reference row produces (the DMCGB hard rows
stay hue-anchored to the defaults; observed scores like ball_in_cup 6.5
were an artifact of that). ±0.5 around the default is the strongest
perturbation that keeps the default-anchored structure; easy < hard
harshness ordering is regression-tested (tests/test_envs.py).

Each table row parameterizes exactly the fields `settings.py` can mutate
(reference: suite/common/settings.py:29-72): grid_rgb1/rgb2/markrgb,
self_rgb, skybox_rgb/rgb2/markrgb.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics.model import Model
from sgqn_carla_tpu.render.raster import (
    GRID_MARK, GRID_RGB1, GRID_RGB2, SKY_MARK, SKY_RGB1, SKY_RGB2,
    Appearance, default_appearance,
)

NUM_COLORS = 100
_SELF_RGB = np.array([0.7, 0.5, 0.3])

_FIELDS = ("grid_rgb1", "grid_rgb2", "grid_markrgb", "self_rgb",
           "skybox_rgb", "skybox_rgb2", "skybox_markrgb")
_DEFAULTS = {
    "grid_rgb1": GRID_RGB1, "grid_rgb2": GRID_RGB2, "grid_markrgb": GRID_MARK,
    "self_rgb": _SELF_RGB,
    "skybox_rgb": SKY_RGB1, "skybox_rgb2": SKY_RGB2, "skybox_markrgb": SKY_MARK,
}


def make_color_table(mode: str, seed: int = 0,
                     external_dir: str = "") -> dict:
    """Returns {field: (NUM_COLORS, 3) float32} device-ready arrays.

    When `external_dir` holds the real DMCGB ``color_{easy,hard}.pt`` torch
    pickle, its rows are used verbatim (reference: env/wrappers.py:117-123);
    otherwise the table is generated procedurally."""
    assert mode in ("color_easy", "color_hard"), mode
    if external_dir:
        from sgqn_carla_tpu.data.formats import load_color_table_pt

        ext = load_color_table_pt(os.path.join(external_dir, f"{mode}.pt"))
        if ext is not None:
            table = {}
            for f in _FIELDS:
                c = ext.get(f)
                if c is None:  # field absent from the pickle: keep default
                    c = np.tile(_DEFAULTS[f][None], (NUM_COLORS, 1))
                table[f] = jnp.asarray(np.clip(c, 0.0, 1.0), jnp.float32)
            return table
    rng = np.random.RandomState(seed + (1 if mode == "color_hard" else 0))
    delta = 0.5 if mode == "color_hard" else 0.1
    table = {}
    for f in _FIELDS:
        c = _DEFAULTS[f][None] + rng.uniform(-delta, delta,
                                             size=(NUM_COLORS, 3))
        table[f] = jnp.asarray(np.clip(c, 0.0, 1.0), jnp.float32)
    return table


def appearance_from_color(model: Model, table: dict, idx) -> Appearance:
    """Build an `Appearance` from color-table row `idx` (traced int ok)."""
    base = default_appearance(model)
    self_rgb = table["self_rgb"][idx]
    # apply self_rgb to every geom whose material starts with "self"
    # (reference: settings.py:51-55 edits only material "self")
    self_mask = np.array(
        [g.material.startswith("self") for g in model.geoms], bool
    )[:, None]
    rgb = jnp.where(jnp.asarray(self_mask), self_rgb[None, :],
                    base.geom_rgba[:, :3])
    geom_rgba = jnp.concatenate([rgb, base.geom_rgba[:, 3:]], axis=1)
    return base.replace(
        geom_rgba=geom_rgba,
        grid_rgb1=table["grid_rgb1"][idx],
        grid_rgb2=table["grid_rgb2"][idx],
        grid_markrgb=table["grid_markrgb"][idx],
        skybox_rgb=table["skybox_rgb"][idx],
        skybox_rgb2=table["skybox_rgb2"][idx],
        skybox_markrgb=table["skybox_markrgb"][idx],
    )
