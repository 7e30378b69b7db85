"""Neural network modules (flax.linen).

Behavioral ports of the reference torch modules (reference:
src/algorithms/modules.py): SharedCNN 11×3×3-conv/32-filter encoder
(modules.py:132-152), HeadCNN flatten (:155-168), RLProjection
Linear+LayerNorm+Tanh (:102-113), tanh-Gaussian Actor (:187-232), twin-Q
Critic (:235-261), CURLHead bilinear (:264-281), InverseDynamics (:284-301),
SODA MLP/predictor (:116-129, :304-312) and the SGQN attribution decoder
(:315-354). Weight init is the same delta-orthogonal scheme (:53-67).

TPU notes: inputs arrive channel-first (reference obs layout) and are
transposed to NHWC — the layout XLA prefers for convolutions; every module
takes an `act` callable so the SGQN guided-backprop pass can swap ReLU for
its custom-VJP variant over the whole critic (see ops/guided_backprop.py)
while sharing parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgqn_carla_tpu.ops.augment import center_crop


def _delta_orthogonal(scale: float = np.sqrt(2)):
    """Conv kernel init: zeros except an orthogonal center tap
    (reference: modules.py:59-67, arXiv:1806.05393)."""
    ortho = nn.initializers.orthogonal(scale)

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        w = jnp.zeros(shape, dtype)
        center = ortho(key, (cin, cout), dtype)
        return w.at[kh // 2, kw // 2].set(center)

    return init


_linear_init = nn.initializers.orthogonal(1.0)


class SharedCNN(nn.Module):
    """11-layer CNN: center-crop 84 → /255 → conv(s2) → 10×conv(s1).

    `dtype` is the computation dtype — bf16 runs the convs on the MXU at
    twice the f32 rate (params stay f32; callers cast outputs back)."""

    num_layers: int = 11
    num_filters: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, act: Callable = nn.relu):
        # x: (B, C, H, W) uint8/float, reference layout
        x = center_crop(x, 84)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype) / 255.0
        x = nn.Conv(self.num_filters, (3, 3), strides=2, padding="VALID",
                    kernel_init=_delta_orthogonal(),
                    bias_init=nn.initializers.zeros, name="conv0",
                    dtype=self.dtype)(x)
        for i in range(1, self.num_layers):
            x = act(x)
            x = nn.Conv(self.num_filters, (3, 3), strides=1, padding="VALID",
                        kernel_init=_delta_orthogonal(),
                        bias_init=nn.initializers.zeros, name=f"conv{i}",
                        dtype=self.dtype)(x)
        return x  # (B, 21, 21, 32) for defaults


class HeadCNN(nn.Module):
    """Optional extra convs + flatten (num_head_layers=0 ⇒ just flatten)."""

    num_layers: int = 0
    num_filters: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, act: Callable = nn.relu):
        for i in range(self.num_layers):
            x = act(x)
            x = nn.Conv(self.num_filters, (3, 3), strides=1, padding="VALID",
                        kernel_init=_delta_orthogonal(),
                        bias_init=nn.initializers.zeros, name=f"hconv{i}",
                        dtype=self.dtype)(x)
        return x.reshape(x.shape[0], -1)


class Trunk(nn.Module):
    """SharedCNN + HeadCNN — the parameter set shared by actor and critic
    (reference: sac.py:29-44 shares the module objects). Computation runs in
    `dtype` (bf16 by default on TPU); the flattened features are cast back
    to f32 so losses/heads keep full precision."""

    num_shared_layers: int = 11
    num_head_layers: int = 0
    num_filters: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, act: Callable = nn.relu):
        x = SharedCNN(self.num_shared_layers, self.num_filters,
                      dtype=self.dtype, name="shared")(x, act)
        x = HeadCNN(self.num_head_layers, self.num_filters,
                    dtype=self.dtype, name="head")(x, act)
        return x.astype(jnp.float32)


def trunk_packed_apply(params_list, x_list, num_shared_layers: int = 11,
                       num_head_layers: int = 0, dtype: Any = jnp.float32,
                       act: Callable = nn.relu):
    """Evaluate g trunk forwards as ONE grouped-conv pass.

    Numerically equivalent to ``[Trunk.apply({"params": p}, x, act) for p, x
    in zip(params_list, x_list)]`` — but every conv layer runs as a single
    ``lax.conv_general_dilated`` with ``feature_group_count=g``. The SGQN
    update traverses the 32-filter trunk ~6× per step (obs / masked-obs /
    next×online / next×target / attribution / aux); at 32 channels each
    traversal fills only a quarter of the TPU's 128-wide vector-lane
    dimension, so packing g of them along the channel axis costs ~1.2-1.4×
    ONE traversal instead of g× (measured: scripts/profile_conv.py — a
    grouped conv packing 4 independent 32-channel paths times 1.4× a single
    one; docs/PERF.md learner notes).

    Weight tying across groups is by passing the SAME param tree object
    multiple times: the packed kernel is a concat of per-group kernels along
    the output-feature axis, so under autodiff the cotangent of a tied tree
    is automatically the sum over its groups — identical to running the
    forwards separately with shared weights.

    params_list: g trunk param trees ({"shared": {...}, "head": {...}}).
    x_list: g inputs, each (B, C, H, W) reference layout, same shapes.
    Returns a list of g flattened f32 feature arrays (B, F), in the same
    (H, W, C)-major order as ``Trunk.__call__``.
    """
    g = len(params_list)
    assert len(x_list) == g and g >= 1

    def pre(x):
        x = center_crop(x, 84)
        return jnp.transpose(x, (0, 2, 3, 1)).astype(dtype) / 255.0

    x = jnp.concatenate([pre(xi) for xi in x_list], axis=-1)

    def packed_conv(x, scope, name, stride):
        k = jnp.concatenate(
            [p[scope][name]["kernel"].astype(dtype) for p in params_list],
            axis=3)
        b = jnp.concatenate(
            [p[scope][name]["bias"].astype(dtype) for p in params_list],
            axis=0)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(stride, stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g)
        return y + b

    x = packed_conv(x, "shared", "conv0", 2)
    for i in range(1, num_shared_layers):
        x = packed_conv(act(x), "shared", f"conv{i}", 1)
    for i in range(num_head_layers):
        x = packed_conv(act(x), "head", f"hconv{i}", 1)
    outs = jnp.split(x, g, axis=-1)
    return [o.reshape(o.shape[0], -1).astype(jnp.float32) for o in outs]


class RLProjection(nn.Module):
    out_dim: int = 100

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(x)
        x = nn.LayerNorm()(x)
        return jnp.tanh(x)


def gaussian_logprob(noise, log_std):
    """(reference: modules.py:20-23)"""
    residual = jnp.sum(-0.5 * noise**2 - log_std, axis=-1, keepdims=True)
    return residual - 0.5 * np.log(2 * np.pi) * noise.shape[-1]


def squash(mu, pi, log_pi):
    """tanh squashing w/ log-prob correction (reference: modules.py:26-33)."""
    mu = jnp.tanh(mu)
    if pi is not None:
        pi = jnp.tanh(pi)
    if log_pi is not None:
        log_pi = log_pi - jnp.sum(
            jnp.log(jax.nn.relu(1 - pi**2) + 1e-6), axis=-1, keepdims=True)
    return mu, pi, log_pi


class ActorHead(nn.Module):
    """Projection + policy MLP operating on trunk features."""

    action_dim: int
    hidden_dim: int = 1024
    projection_dim: int = 100
    log_std_min: float = -10.0
    log_std_max: float = 2.0

    @nn.compact
    def __call__(self, feats):
        h = RLProjection(self.projection_dim, name="projection")(feats)
        h = nn.Dense(self.hidden_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(h)
        h = nn.relu(h)
        out = nn.Dense(2 * self.action_dim, kernel_init=_linear_init,
                       bias_init=nn.initializers.zeros)(h)
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.tanh(log_std)
        log_std = self.log_std_min + 0.5 * (
            self.log_std_max - self.log_std_min) * (log_std + 1)
        return mu, log_std


class QFunction(nn.Module):
    hidden_dim: int = 1024
    use_layernorm: bool = False  # opt-in (--q_head_layernorm): LayerNorm
    # before each hidden activation — the standard off-policy-critic
    # stabilizer; no reference equivalent (modules.py:235-246 is plain MLP)

    @nn.compact
    def __call__(self, obs_feat, action, act: Callable = nn.relu):
        h = jnp.concatenate([obs_feat, action], axis=-1)
        h = nn.Dense(self.hidden_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(h)
        if self.use_layernorm:
            h = nn.LayerNorm()(h)
        h = act(h)
        h = nn.Dense(self.hidden_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(h)
        if self.use_layernorm:
            h = nn.LayerNorm()(h)
        h = act(h)
        return nn.Dense(1, kernel_init=_linear_init,
                        bias_init=nn.initializers.zeros)(h)


class CriticHead(nn.Module):
    """Projection + twin Q heads on trunk features. Submodules live in
    `setup` so `encode` (projection only — used by CURL/SGQN aux heads) can
    be called via `method=` with shared parameters."""

    hidden_dim: int = 1024
    projection_dim: int = 100
    q_layernorm: bool = False

    def setup(self):
        self.projection = RLProjection(self.projection_dim)
        self.Q1 = QFunction(self.hidden_dim, self.q_layernorm)
        self.Q2 = QFunction(self.hidden_dim, self.q_layernorm)

    def __call__(self, feats, action, act: Callable = nn.relu):
        h = self.projection(feats)
        return self.Q1(h, action, act), self.Q2(h, action, act)

    def encode(self, feats):
        return self.projection(feats)


class CURLHead(nn.Module):
    """Bilinear contrastive logits (reference: modules.py:264-281)."""

    z_dim: int = 100

    @nn.compact
    def __call__(self, z_a, z_pos):
        W = self.param("W", nn.initializers.uniform(1.0),
                       (self.z_dim, self.z_dim))
        Wz = W @ z_pos.T                      # (z, B)
        logits = z_a @ Wz                     # (B, B)
        return logits - jnp.max(logits, axis=1, keepdims=True)


class InverseDynamics(nn.Module):
    """PAD auxiliary head (reference: modules.py:284-301)."""

    action_dim: int
    hidden_dim: int = 1024

    @nn.compact
    def __call__(self, h, h_next):
        x = jnp.concatenate([h, h_next], axis=-1)
        x = nn.Dense(self.hidden_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(x)
        x = nn.relu(x)
        return nn.Dense(self.action_dim, kernel_init=_linear_init,
                        bias_init=nn.initializers.zeros)(x)


class SODAMLP(nn.Module):
    """Projection MLP with BatchNorm (reference: modules.py:116-129).
    BatchNorm runs in always-training mode with batch statistics — the
    reference never switches the predictor to eval during updates."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros)(x)
        x = nn.BatchNorm(use_running_average=False, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, kernel_init=_linear_init,
                        bias_init=nn.initializers.zeros)(x)


class AttributionDecoder(nn.Module):
    """SGQN saliency decoder: (feat+action) → (K·3)×84×84 logits
    (reference: modules.py:315-339 — Linear to 32·21·21, two 2× upsamples,
    convs 128/64/9). `spatial` generalizes the hard-coded 21 so smaller test
    networks decode too; `out_size` crops/pads the 4× upsampled grid to the
    observation size (21·4 = 84 exactly for the reference shapes)."""

    action_dim: int
    emb_dim: int = 100
    spatial: int = 21
    out_channels: int = 9
    out_size: int = 84
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, action):
        s = self.spatial
        x = jnp.concatenate([feat, action], axis=-1).astype(self.dtype)
        x = nn.Dense(32 * s * s, kernel_init=_linear_init,
                     bias_init=nn.initializers.zeros, name="proj",
                     dtype=self.dtype)(x)
        x = x.reshape(-1, s, s, 32)            # NHWC
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=1, name="conv1", dtype=self.dtype)(x)
        x = _upsample2(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding=1, name="conv2", dtype=self.dtype)(x)
        x = _upsample2(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv3",
                    dtype=self.dtype)(x)
        if x.shape[1] != self.out_size:
            x = jax.image.resize(
                x, (x.shape[0], self.out_size, self.out_size, x.shape[-1]),
                "nearest")
        # output (B, K*3, H, W) channel-first like the obs; logits in f32
        # so the BCE loss keeps full precision
        return jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)


def _upsample2(x):
    """Nearest-neighbor 2× upsample (reference uses F.upsample default).

    Broadcast + reshape instead of `jax.image.resize`: resize lowers to a
    gather per spatial axis, which costs ~10× on TPU for these NHWC
    activations (measured: the gather-based decoder forward was ~32 ms at
    B=128 vs ~2 ms for the whole bf16 decoder with this formulation)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
