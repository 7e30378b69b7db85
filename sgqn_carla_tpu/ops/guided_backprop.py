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


def _row_quantile_topk(x, quantile: float):
    """Exact per-row `quantile` (linear interpolation — `jnp.quantile`
    semantics) via `lax.top_k` instead of a full sort.

    Round-3 history: top_k with k≈353 beats sorting all 7056 columns, but
    the TPU lowers top_k to a near-full comparator-network sort, so both
    cost ~1.65-1.86 ms at the update's (384, 7056) shape — 22% of the
    whole SGQN update. Kept for the A/B in scripts/profile_update.py; the
    production path is the bisection select below.
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


def _row_quantile(x, quantile: float):
    """Exact per-row `quantile` (`jnp.quantile` linear-interpolation
    semantics) of NON-NEGATIVE f32 rows, via bisection on the IEEE bit
    pattern instead of a sort.

    For x ≥ 0, the f32 bit pattern viewed as int32 is monotone in x, so
    the k-th largest element is found exactly by 31 unrolled bisection
    steps, each a (rows, n) compare + row-sum — ~90M VPU op-units at the
    update's (384, 7056) shape versus a full comparator-network sort
    (`top_k` ≈ sort on TPU: 1.65 ms measured; docs/PERF.md learner
    notes). The two order statistics bracketing the quantile position are
    recovered exactly (ties included), so the result is bit-identical to
    `jnp.quantile` for every finite non-negative input.
    """
    n = x.shape[-1]
    pos = quantile * (n - 1)            # fractional index in ascending order
    low_idx = int(np.floor(pos))
    frac = pos - low_idx
    k = n - low_idx                     # v_lo = k-th LARGEST = asc[low_idx]
    keys = jax.lax.bitcast_convert_type(x, jnp.int32)
    lo = jnp.zeros(x.shape[:-1], jnp.int32)             # count_ge(lo) >= k
    hi = jnp.full(x.shape[:-1], jnp.int32(0x7F800000))  # count_ge(inf) = 0 < k
    for _ in range(31):
        mid = lo + (hi - lo) // 2
        ge = jnp.sum(keys >= mid[..., None], axis=-1) >= k
        lo = jnp.where(ge, mid, lo)
        hi = jnp.where(ge, hi, mid)
    v_lo = jax.lax.bitcast_convert_type(lo, jnp.float32)
    if k < 2:
        return v_lo
    # asc[low_idx + 1] (the (k-1)-th largest): with c = #{x > v_lo} < k,
    # either c == k-1 (no tie spill: it is the smallest element above v_lo)
    # or c < k-1 (ties: it is v_lo again).
    gt = x > v_lo[..., None]
    c = jnp.sum(gt, axis=-1)
    above_min = jnp.min(jnp.where(gt, x, jnp.inf), axis=-1)
    v_hi = jnp.where(c == k - 1, above_min, v_lo)
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
