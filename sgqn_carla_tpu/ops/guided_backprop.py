"""Guided backpropagation as a fused custom-VJP pass (SGQN attribution).

The reference computes attributions with captum's GuidedBackprop — an extra
torch forward+backward with hooks that gate every ReLU's gradient
(reference: src/algorithms/rl_utils.py:35-39, sgsac.py:65-66). Here the gate
is a `jax.custom_vjp` activation: the whole guided pass is one `jax.grad`
through the critic with `guided_relu` swapped in for ReLU (same parameters),
so it fuses into the jitted update — no hooks, no graph surgery, no host
sync (SURVEY §7 hard part #3).

Guided-backprop rule at each ReLU: dx = g · 1[x > 0] · 1[g > 0].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def guided_relu(x):
    return jnp.maximum(x, 0.0)


def _fwd(x):
    return jnp.maximum(x, 0.0), x


def _bwd(x, g):
    return (g * (x > 0) * (g > 0),)


guided_relu.defvjp(_fwd, _bwd)


def compute_attribution(q1_fn, obs, action):
    """∂(Σ Q1)/∂obs with guided-ReLU semantics.

    q1_fn(obs, action) must evaluate the critic's Q1 using `guided_relu`
    activations (the caller passes an apply-fn bound to shared params —
    matching captum's ModelWrapper returning Q1, rl_utils.py:23-32).
    Returns an array shaped like obs.
    """
    def scalar_q(o):
        return jnp.sum(q1_fn(o, action))

    return jax.grad(scalar_q)(obs.astype(jnp.float32))


def _row_quantile(x, quantile: float):
    """Exact per-row `quantile` (linear interpolation — `jnp.quantile`
    semantics) via `lax.top_k` instead of a full sort.

    The mask only needs the two order statistics bracketing the quantile
    position; for the SGQN default (0.95 over 84×84 pixels) that is the
    top ~5% — `top_k` with k≈353 beats sorting all 7056 columns on the
    TPU's comparator-network sort (docs/PERF.md learner notes). Falls back
    to `jnp.quantile` when the quantile is low enough that top_k would
    cover most of the row anyway.
    """
    n = x.shape[-1]
    pos = quantile * (n - 1)            # fractional index in ascending order
    lo = int(np.floor(pos))
    frac = pos - lo
    k = n - lo                          # elements from asc[lo] upward
    if k > n // 2:                      # low quantile: sort is cheaper
        return jnp.quantile(x, quantile, axis=-1)
    top = jax.lax.top_k(x, k)[0]        # descending, shape (..., k)
    v_lo = top[..., k - 1]              # asc[lo]
    v_hi = top[..., k - 2] if k >= 2 else top[..., 0]  # asc[lo+1]
    return v_lo + frac * (v_hi - v_lo)


def compute_attribution_mask(obs_grad, quantile: float = 0.95):
    """Per-frame, per-sample quantile threshold mask
    (reference: rl_utils.py:76-82).

    obs_grad: (B, 9, H, W). For each frame triple (channels [0:3], [3:6],
    [6:9]): abs-max over RGB → per-sample `quantile` over pixels → boolean
    mask repeated to 3 channels; concatenated back to (B, 9, H, W).
    The three frame triples stack into one (3B, H·W) row-quantile call so
    the top_k runs once.
    """
    b, c, h, w = obs_grad.shape
    g = obs_grad.reshape(b, 3, 3, h, w)            # (B, frame, rgb, H, W)
    attr = jnp.max(jnp.abs(g), axis=2)             # (B, 3, H, W)
    q = _row_quantile(attr.reshape(b * 3, h * w), quantile).reshape(b, 3)
    m = attr >= q[:, :, None, None]                # (B, 3, H, W)
    return jnp.repeat(m, 3, axis=1)                # frame-triple masks ×3 rgb
