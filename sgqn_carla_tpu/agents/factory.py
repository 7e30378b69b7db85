"""Algorithm factory (reference: src/algorithms/factory.py:10-23).

The reference's arg whitelist admits "saca"/"sacfa" which its factory then
KeyErrors on (SURVEY §2.1); here the config whitelist and the factory agree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from sgqn_carla_tpu.agents.sac import SAC
from sgqn_carla_tpu.agents.sgsac import SGSAC
from sgqn_carla_tpu.agents.variants import CURL, PAD, RAD, SODA, SVEA, DrQ
from sgqn_carla_tpu.core.config import Config
from sgqn_carla_tpu.data.overlay import get_overlay_pool

ALGORITHMS = {
    "sac": SAC,
    "rad": RAD,
    "curl": CURL,
    "pad": PAD,
    "soda": SODA,
    "drq": DrQ,
    "svea": SVEA,
    "sgsac": SGSAC,
}

_NEEDS_OVERLAY = {"svea", "soda", "sgsac"}


def make_agent(obs_shape: Tuple[int, ...], action_shape: Tuple[int, ...],
               cfg: Config, overlay_pool=None):
    if cfg.algorithm not in ALGORITHMS:
        raise ValueError(f"unknown algorithm {cfg.algorithm!r}; "
                         f"available: {sorted(ALGORITHMS)}")
    if overlay_pool is None and cfg.algorithm in _NEEDS_OVERLAY:
        import os

        from sgqn_carla_tpu.core.config import resolve_data_dir

        data_dir = resolve_data_dir(cfg)
        # pre-converted .npy pool under overlay/, else the dataset root
        # (where a real places365_standard JPEG tree lives — the reference
        # layout, augmentations.py:27-30)
        ext = ""
        if data_dir:
            ov = os.path.join(data_dir, "overlay")
            ext = ov if os.path.isdir(ov) else data_dir
        overlay_pool = jnp.asarray(
            get_overlay_pool(cfg.image_crop_size, cfg.image_crop_size,
                             seed=cfg.seed, external_dir=ext,
                             band=getattr(cfg, "overlay_band", "narrow")))
    return ALGORITHMS[cfg.algorithm](obs_shape, action_shape, cfg,
                                     overlay_pool=overlay_pool)
