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


def compute_attribution_mask(obs_grad, quantile: float = 0.95):
    """Per-frame, per-sample quantile threshold mask
    (reference: rl_utils.py:76-82).

    obs_grad: (B, 9, H, W). For each frame triple (channels [0:3], [3:6],
    [6:9]): abs-max over RGB → per-sample `quantile` over pixels → boolean
    mask repeated to 3 channels; concatenated back to (B, 9, H, W).
    """
    b, c, h, w = obs_grad.shape
    masks = []
    for i in (0, 3, 6):
        attr = jnp.max(jnp.abs(obs_grad[:, i:i + 3]), axis=1)   # (B, H, W)
        q = jnp.quantile(attr.reshape(b, -1), quantile, axis=1)
        m = attr >= q[:, None, None]
        masks.append(jnp.repeat(m[:, None], 3, axis=1))
    return jnp.concatenate(masks, axis=1)
