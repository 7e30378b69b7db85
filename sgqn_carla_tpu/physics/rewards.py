"""Soft indicator reward shaping, JAX edition.

Behavioral port of dm_control's `rewards.tolerance` sigmoid family
(reference: src/env/dm_control/dm_control/utils/rewards.py:28-130), written
as pure jnp functions so task rewards trace into the jitted env step.

Differences from the reference implementation:
  * sigmoid selection and the margin==0 branch are resolved at trace time
    (python-level), so there is no data-dependent control flow inside jit;
  * works on scalars and arrays alike and is trivially vmappable.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_DEFAULT_VALUE_AT_MARGIN = 0.1


def _sigmoid(x, value_at_1: float, sigmoid: str):
    """1 at x==0, `value_at_1` at |x|==1, monotone decreasing in |x|."""
    if sigmoid in ("cosine", "linear", "quadratic"):
        if not 0 <= value_at_1 < 1:
            raise ValueError(
                f"`value_at_1` must be nonnegative and smaller than 1, got {value_at_1}."
            )
    else:
        if not 0 < value_at_1 < 1:
            raise ValueError(
                f"`value_at_1` must be strictly between 0 and 1, got {value_at_1}."
            )

    if sigmoid == "gaussian":
        scale = np.sqrt(-2 * np.log(value_at_1))
        return jnp.exp(-0.5 * (x * scale) ** 2)
    if sigmoid == "hyperbolic":
        scale = np.arccosh(1 / value_at_1)
        return 1 / jnp.cosh(x * scale)
    if sigmoid == "long_tail":
        scale = np.sqrt(1 / value_at_1 - 1)
        return 1 / ((x * scale) ** 2 + 1)
    if sigmoid == "cosine":
        scale = np.arccos(2 * value_at_1 - 1) / np.pi
        sx = x * scale
        return jnp.where(jnp.abs(sx) < 1, (1 + jnp.cos(np.pi * sx)) / 2, 0.0)
    if sigmoid == "linear":
        scale = 1 - value_at_1
        sx = x * scale
        return jnp.where(jnp.abs(sx) < 1, 1 - sx, 0.0)
    if sigmoid == "quadratic":
        scale = np.sqrt(1 - value_at_1)
        sx = x * scale
        return jnp.where(jnp.abs(sx) < 1, 1 - sx**2, 0.0)
    if sigmoid == "tanh_squared":
        scale = np.arctanh(np.sqrt(1 - value_at_1))
        return 1 - jnp.tanh(x * scale) ** 2
    raise ValueError(f"Unknown sigmoid type {sigmoid!r}.")


def tolerance(
    x,
    bounds=(0.0, 0.0),
    margin: float = 0.0,
    sigmoid: str = "gaussian",
    value_at_margin: float = _DEFAULT_VALUE_AT_MARGIN,
):
    """Returns 1 inside `bounds`, decaying to 0 outside per `sigmoid`.

    `bounds` / `margin` / `sigmoid` must be trace-time constants (they are in
    every dm_control task); `x` may be a traced scalar or array.
    """
    lower, upper = bounds
    if lower > upper:
        raise ValueError("Lower bound must be <= upper bound.")
    if margin < 0:
        raise ValueError("`margin` must be non-negative.")

    x = jnp.asarray(x)
    in_bounds = jnp.logical_and(lower <= x, x <= upper)
    if margin == 0:
        return jnp.where(in_bounds, 1.0, 0.0)
    d = jnp.where(x < lower, lower - x, x - upper) / margin
    return jnp.where(in_bounds, 1.0, _sigmoid(d, value_at_margin, sigmoid))
