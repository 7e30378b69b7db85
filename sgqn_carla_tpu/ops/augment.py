"""Image augmentations as pure, vmapped jnp functions.

Behavioral ports of the reference CUDA/kornia augmentations (reference:
src/augmentations.py): random_crop (:236-264, as_strided window gather),
random_shift (:229-233, replicate-pad + crop), random_overlay (:79-99,
α-blend with a dataset image), attribution_augmentation (:102-123, keep
salient pixels / fill the rest from the dataset), random_conv (:192-201,
random 3×3 conv + sigmoid).

Conventions: images are (B, C, H, W); uint8 [0,255] in/out unless noted.
Everything jits into the agent update — no host sync, no dataloader.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _crop_one(img, y0, x0, size):
    """Dynamic crop of one (C, H, W) image."""
    c = img.shape[0]
    return jax.lax.dynamic_slice(img, (0, y0, x0), (c, size, size))


def random_crop(rng, imgs, size: int = 84, return_offsets: bool = False):
    """Per-sample random crop (B, C, H, W) → (B, C, size, size)."""
    b, c, h, w = imgs.shape
    crop_max = h - size
    if crop_max <= 0:
        if return_offsets:
            return imgs, None, None
        return imgs
    ky, kx = jax.random.split(rng)
    y0 = jax.random.randint(ky, (b,), 0, crop_max + 1)
    x0 = jax.random.randint(kx, (b,), 0, crop_max + 1)
    out = jax.vmap(_crop_one, in_axes=(0, 0, 0, None))(imgs, y0, x0, size)
    if return_offsets:
        return out, y0, x0
    return out


def crop_at(imgs, y0, x0, size: int = 84):
    """Crop every sample at the SAME given offsets (CURL pos pairs etc.)."""
    return jax.vmap(_crop_one, in_axes=(0, 0, 0, None))(imgs, y0, x0, size)


def center_crop(imgs, size: int = 84):
    """Deterministic center crop (reference: modules.CenterCrop, :70-83)."""
    h = imgs.shape[-2]
    if h == size:
        return imgs
    p = (h - size) // 2
    return imgs[..., p:p + size, p:p + size]


def random_shift(rng, imgs, pad: int = 4):
    """Replicate-pad by `pad` then random crop back (DrQ shift)."""
    b, c, h, w = imgs.shape
    padded = jnp.pad(
        imgs, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge"
    )
    return random_crop(rng, padded, size=h)


def random_overlay(rng, imgs, pool, alpha_blending: float = 0.2):
    """α-blend with a random dataset image.

    imgs: (B, C, H, W) uint8/float [0,255]; pool: (N, 3, h, w) float [0,1].
    The overlay repeats across the frame-stack channels
    (reference: augmentations.py:87 `.repeat(1, x.size(1)//3, 1, 1)`)."""
    b, c, h, w = imgs.shape
    idx = jax.random.randint(rng, (b,), 0, pool.shape[0])
    over = pool[idx]  # (B, 3, h, w)
    if over.shape[-2:] != (h, w):
        over = jax.image.resize(over, (b, 3, h, w), "linear")
    over = jnp.tile(over, (1, c // 3, 1, 1))
    x = imgs.astype(jnp.float32) / 255.0
    out = (1.0 - alpha_blending) * x + alpha_blending * over
    return out * 255.0


def attribution_augmentation(rng, imgs, mask, pool):
    """Keep salient pixels, fill the rest with a dataset image
    (reference: augmentations.py:102-123): s̃ = x·m/255 + img·(1−m), ×255."""
    b, c, h, w = imgs.shape
    idx = jax.random.randint(rng, (b,), 0, pool.shape[0])
    over = pool[idx]
    if over.shape[-2:] != (h, w):
        over = jax.image.resize(over, (b, 3, h, w), "linear")
    over = jnp.tile(over, (1, c // 3, 1, 1))
    m = mask.astype(jnp.float32)
    x = imgs.astype(jnp.float32)
    s_tilde = (x * m / 255.0 + over * (1.0 - m)) * 255.0
    return s_tilde


def random_conv(rng, imgs):
    """Per-sample random 3×3 conv over each RGB frame then sigmoid
    (reference: augmentations.py:192-201)."""
    b, c, h, w = imgs.shape
    n_frames = c // 3
    x = imgs.astype(jnp.float32).reshape(b * n_frames, 3, h, w) / 255.0
    weights = jax.random.normal(rng, (b, 3, 3, 3, 3), jnp.float32)
    weights = jnp.repeat(weights, n_frames, axis=0)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")

    def conv_one(xi, wi):
        return jax.lax.conv_general_dilated(
            xi[None], wi, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]

    out = jax.vmap(conv_one)(x, weights)
    out = jax.nn.sigmoid(out) * 255.0
    return out.reshape(b, c, h, w)


def batch_from_obs(obs, batch_size: int = 32):
    """Tile one observation along a new batch axis
    (reference: augmentations.py:204-213)."""
    if obs.ndim == 3:
        obs = obs[None]
    return jnp.tile(obs, (batch_size, 1, 1, 1))


def prepare_pad_batch(rng, obs, next_obs, action, batch_size: int = 32,
                      size: int = 84):
    """Test-time PAD batch: tiled obs pair + independent random crops
    (reference: augmentations.py:216-222)."""
    k1, k2 = jax.random.split(rng)
    b_obs = random_crop(k1, batch_from_obs(obs, batch_size), size)
    b_next = random_crop(k2, batch_from_obs(next_obs, batch_size), size)
    b_act = jnp.tile(action[None], (batch_size, 1))
    return b_obs, b_next, b_act
