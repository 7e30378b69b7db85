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


def _affine_grid_sample(img, inv):
    """Bilinear-sample one (C, H, W) image through a 2×3 inverse affine map
    (output pixel → input pixel), zeros outside — the kornia warp_affine
    semantics used by RandomAffine (reference: augmentations.py:128-131)."""
    from jax.scipy.ndimage import map_coordinates

    c, h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    src_x = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    src_y = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])

    def one(ch):
        return map_coordinates(ch, coords, order=1, mode="constant",
                               cval=0.0).reshape(h, w)

    return jax.vmap(one)(img)


def random_affine(rng, imgs, degrees: float = 45.0, translate: float = 0.3,
                  scale=(0.5, 1.5), shear: float = 0.15):
    """Per-sample random affine warp (rotation/translation/scale/shear about
    the image center), kornia RandomAffine parameterization (reference:
    augmentations.py:128-131). Returns (warped, inv_mats) so the SAME warp
    can be replayed on a mask via `affine_apply` (paired_aug semantics,
    reference :138 `sem(mask, sem._params)`)."""
    b, c, h, w = imgs.shape
    ks = jax.random.split(rng, 4)
    theta = jnp.deg2rad(jax.random.uniform(ks[0], (b,), jnp.float32,
                                           -degrees, degrees))
    txy = jax.random.uniform(ks[1], (b, 2), jnp.float32,
                             -translate, translate) * jnp.asarray([w, h])
    sc = jax.random.uniform(ks[2], (b,), jnp.float32, scale[0], scale[1])
    # kornia interprets shear bounds as degrees ([0, 0.15]° in the reference)
    sh = jnp.tan(jnp.deg2rad(
        jax.random.uniform(ks[3], (b,), jnp.float32, 0.0, shear)))
    # forward map about the center: T(center+t) · R(θ) · Shear · S(sc) · T(−center)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # A = R·Shear·S (2×2), then x' = A(x−c) + c + t
    a00 = sc * cos
    a01 = sc * (cos * sh - sin)
    a10 = sc * sin
    a11 = sc * (sin * sh + cos)
    A = jnp.stack([jnp.stack([a00, a01], -1),
                   jnp.stack([a10, a11], -1)], -2)  # (B, 2, 2)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    inv2 = jnp.stack(
        [jnp.stack([A[:, 1, 1], -A[:, 0, 1]], -1),
         jnp.stack([-A[:, 1, 0], A[:, 0, 0]], -1)], -2) / det[:, None, None]
    centre = jnp.asarray([cx, cy], jnp.float32)
    off = centre[None] + txy  # output-space pivot after translation
    # inverse: x_in = inv2 @ (x_out − c − t) + c
    inv_t = centre[None, :] - jnp.einsum("bij,bj->bi", inv2, off)
    inv = jnp.concatenate([inv2, inv_t[:, :, None]], axis=-1)  # (B, 2, 3)
    x = imgs.astype(jnp.float32)
    out = jax.vmap(_affine_grid_sample)(x, inv)
    return out, inv


def affine_apply(imgs, inv):
    """Replay a warp from `random_affine` on another batch (e.g. the mask)."""
    return jax.vmap(_affine_grid_sample)(imgs.astype(jnp.float32), inv)


def random_erasing(rng, imgs, scale=(0.02, 0.33), ratio=(0.3, 3.3),
                   p: float = 0.5):
    """Zero a random rectangle per sample with probability `p` (kornia
    RandomErasing defaults; reference: augmentations.py:132). Returns
    (erased, keep_mask) with keep_mask (B, 1, H, W) ∈ {0,1} so the same
    rectangle can be erased from a paired mask."""
    b, c, h, w = imgs.shape
    ks = jax.random.split(rng, 5)
    area = jax.random.uniform(ks[0], (b,), jnp.float32, scale[0], scale[1])
    logr = jax.random.uniform(ks[1], (b,), jnp.float32,
                              jnp.log(ratio[0]), jnp.log(ratio[1]))
    r = jnp.exp(logr)
    eh = jnp.clip(jnp.sqrt(area * h * w / r), 1, h - 1)
    ew = jnp.clip(jnp.sqrt(area * h * w * r), 1, w - 1)
    y0 = jax.random.uniform(ks[2], (b,), jnp.float32) * (h - eh)
    x0 = jax.random.uniform(ks[3], (b,), jnp.float32) * (w - ew)
    apply = jax.random.uniform(ks[4], (b,), jnp.float32) < p
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
              & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
    erase = inside & apply[:, None, None]
    keep = (~erase)[:, None].astype(jnp.float32)  # (B, 1, H, W)
    return imgs.astype(jnp.float32) * keep, keep


def paired_aug(rng, obs, mask, pool, alpha_blending: float = 0.5):
    """One semantic aug (random affine OR random erasing, 50/50) applied
    IDENTICALLY to the observation and its attribution mask, then a
    random_overlay on the augmented observation only (reference:
    augmentations.py:126-139). obs uint8/float [0,255]; mask {0,1}.
    Returns (img_out, mask_out)."""
    k_sel, k_aff, k_er, k_ov = jax.random.split(rng, 4)
    use_affine = jax.random.bernoulli(k_sel)
    obs_a, inv = random_affine(k_aff, obs)
    mask_a = affine_apply(mask, inv)
    obs_e, keep = random_erasing(k_er, obs)
    mask_e = mask.astype(jnp.float32) * keep
    obs_sem = jnp.where(use_affine, obs_a, obs_e)
    mask_out = jnp.where(use_affine, mask_a, mask_e)
    img_out = random_overlay(k_ov, obs_sem, pool, alpha_blending)
    return img_out, mask_out


def attribution_random_patch_augmentation(rng, x, cam, pool,
                                          output_size: int = 4,
                                          quantile: float = 0.90,
                                          patch_proba: float = 0.7):
    """Patch-level attribution aug (reference: augmentations.py:142-179):
    pool the saliency map to `output_size`² cells, keep the top-quantile
    cells with prob `patch_proba` each (plus one forced "exploration" cell
    chosen uniformly among the salient ones), upsample the cell mask to
    image size, and fill the unselected area from the dataset pool.

    x: (B, C, H, W) [0,255]; cam: (B, H, W) saliency; pool: (N,3,h,w) [0,1].
    """
    b, c, h, w = x.shape
    k_e, k_b, k_n = jax.random.split(rng, 3)
    # adaptive average pool to (output_size, output_size) — H, W divisible
    fh, fw = h // output_size, w // output_size
    cam4 = cam[:, :output_size * fh, :output_size * fw].reshape(
        b, output_size, fh, output_size, fw).mean(axis=(2, 4))
    q = jnp.quantile(cam4.reshape(b, -1), quantile, axis=1)
    m = (cam4 >= q[:, None, None])
    expl = jax.random.uniform(k_e, m.shape, jnp.float32)
    expl = jnp.where(m, expl, 0.0)
    emax = expl.reshape(b, -1).max(axis=1)
    expl_mask = expl == emax[:, None, None]
    bern = jax.random.bernoulli(k_b, patch_proba, m.shape)
    patch = ((m & bern) | expl_mask).astype(jnp.float32)
    patch_img = jnp.repeat(jnp.repeat(patch, fh, axis=1), fw, axis=2)
    patch_img = patch_img[:, None]  # (B, 1, H, W), nearest upsample
    idx = jax.random.randint(k_n, (b,), 0, pool.shape[0])
    neg = pool[idx]
    if neg.shape[-2:] != (h, w):
        neg = jax.image.resize(neg, (b, 3, h, w), "linear")
    neg = jnp.tile(neg, (1, c // 3, 1, 1)) * 255.0
    return x.astype(jnp.float32) * patch_img + neg * (1.0 - patch_img)


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
