"""SGQN attribution imagery: observation / attribution / mask grids.

Parity with the reference's TensorBoard + PNG diagnostics (reference:
src/algorithms/sgsac.py:104-161 log_tensorboard/save_image and
rl_utils.py:85-107 grid builders): per-frame observation grids, guided-
backprop attribution heatmaps, predicted-attribution sigmoids, and masked
observations at quantiles {0.9, 0.95, 0.975, 0.995, 0.999}. Output is PNG
files under ``<work_dir>/output/`` (written with the native hostio encoder
when available) — the content the reference puts in TensorBoard images.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.ops.guided_backprop import compute_attribution_mask

QUANTILES = (0.9, 0.95, 0.975, 0.995, 0.999)


def _grid(frames: np.ndarray, nrow: int = 3, pad: int = 2) -> np.ndarray:
    """(N, 3, H, W) float [0,1] → tiled (H', W', 3) uint8 grid
    (the torchvision make_grid role, reference: rl_utils.py:85-91)."""
    n, c, h, w = frames.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    out = np.zeros((nrows * (h + pad) + pad, ncol * (w + pad) + pad, 3),
                   np.float32)
    for i in range(n):
        r, cidx = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + cidx * (w + pad)
        out[y:y + h, x:x + w] = frames[i].transpose(1, 2, 0)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def _obs_grid(obs: np.ndarray, n: int = 4) -> np.ndarray:
    """Split each stacked obs into its 3 RGB frames (reference:
    make_obs_grid, rl_utils.py:85-91)."""
    frames = []
    for i in range(min(n, obs.shape[0])):
        for j in range(0, obs.shape[1], 3):
            frames.append(obs[i, j:j + 3] / 255.0)
    return _grid(np.stack(frames))


def _grad_grid(grad: np.ndarray, n: int = 4) -> np.ndarray:
    """Per-frame abs-max attribution heatmaps, top-3% highlighted
    (reference: make_obs_grad_grid, rl_utils.py:98-107)."""
    frames = []
    for i in range(min(n, grad.shape[0])):
        for j in range(0, grad.shape[1], 3):
            a = np.abs(grad[i, j:j + 3]).max(0)
            a = a / (a.max() + 1e-9)
            frames.append(np.stack([a, a, a]))
    sample = np.stack(frames)
    q = np.quantile(sample.reshape(sample.shape[0], -1), 0.97, axis=1)
    sample = np.where(sample <= q[:, None, None, None], 0.0, sample)
    return _grid(sample)


def save_attribution_images(agent, astate, obs, action, out_dir: str,
                            step: int, prefix: str = "original"):
    """Dump the reference's diagnostic image set for one batch."""
    os.makedirs(os.path.join(out_dir, prefix), exist_ok=True)
    obs_j = jnp.asarray(obs, jnp.float32)
    act_j = jnp.asarray(action, jnp.float32)
    grad = np.asarray(agent.attribution_grad(astate.params, obs_j, act_j))
    pred = np.asarray(jax.nn.sigmoid(agent.predict_attribution(
        agent._aux_tree(astate.params, astate.aux_params), obs_j, act_j)))
    obs_np = np.asarray(obs, np.float32)

    images: Dict[str, np.ndarray] = {
        "observation": _obs_grid(obs_np),
        "attributions": _grad_grid(grad),
        "predicted_attrib": _obs_grid(pred * 255.0),
        "masked_obs": _obs_grid(obs_np * (pred > 0.5)),
    }
    for q in QUANTILES:
        mask = np.asarray(compute_attribution_mask(jnp.asarray(grad), q))
        images[f"attrib_q{q}"] = _obs_grid(obs_np * mask)

    paths, frames = [], []
    for name, img in images.items():
        paths.append(os.path.join(out_dir, prefix, f"{name}_{step}.png"))
        frames.append(img)
    hmax = max(f.shape[0] for f in frames)
    wmax = max(f.shape[1] for f in frames)
    padded = np.zeros((len(frames), hmax, wmax, 3), np.uint8)
    for i, fr in enumerate(frames):
        padded[i, :fr.shape[0], :fr.shape[1]] = fr
    from sgqn_carla_tpu.core import native
    if not native.png_write_batch(padded, paths):
        from sgqn_carla_tpu.train.video import _write_png
        for p, fr in zip(paths, padded):
            _write_png(p, fr)
    return sorted(images)
