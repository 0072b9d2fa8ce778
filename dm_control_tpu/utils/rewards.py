"""Soft-indicator reward primitives (pure jnp).

Re-expresses the semantics of the reference's most-reused function,
`rewards.tolerance` with its eight sigmoid kernels
(dm_control/utils/rewards.py:28-134), as branch-free jnp ops usable inside
jit/vmap.  Scale factors are resolved at trace time (value_at_margin is a
Python float), so each sigmoid compiles to a couple of VPU ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_VALUE_AT_MARGIN = 0.1


def _sigmoid(x, value_at_1: float, sigmoid: str):
  """Kernel value at normalized distance x (>= 0), equal to value_at_1 at 1."""
  v = value_at_1
  if sigmoid == 'gaussian':
    scale = np.sqrt(-2.0 * np.log(v))
    return jnp.exp(-0.5 * (x * scale) ** 2)
  if sigmoid == 'hyperbolic':
    scale = np.arccosh(1.0 / v)
    return 1.0 / jnp.cosh(x * scale)
  if sigmoid == 'long_tail':
    scale = np.sqrt(1.0 / v - 1.0)
    return 1.0 / ((x * scale) ** 2 + 1.0)
  if sigmoid == 'reciprocal':
    scale = 1.0 / v - 1.0
    return 1.0 / (jnp.abs(x) * scale + 1.0)
  if sigmoid == 'cosine':
    scale = np.arccos(2.0 * v - 1.0) / np.pi
    scaled = x * scale
    cos_val = jnp.cos(jnp.pi * jnp.clip(scaled, -1.0, 1.0))
    return jnp.where(jnp.abs(scaled) < 1, (1.0 + cos_val) / 2.0, 0.0)
  if sigmoid == 'linear':
    scale = 1.0 - v
    scaled = x * scale
    return jnp.where(jnp.abs(scaled) < 1, 1.0 - scaled, 0.0)
  if sigmoid == 'quadratic':
    scale = np.sqrt(1.0 - v)
    scaled = x * scale
    return jnp.where(jnp.abs(scaled) < 1, 1.0 - scaled ** 2, 0.0)
  if sigmoid == 'tanh_squared':
    scale = np.arctanh(np.sqrt(1.0 - v))
    return 1.0 - jnp.tanh(x * scale) ** 2
  raise ValueError(f'unknown sigmoid {sigmoid!r}')


def tolerance(x, bounds=(0.0, 0.0), margin=0.0,
              sigmoid: str = 'gaussian',
              value_at_margin: float = _DEFAULT_VALUE_AT_MARGIN):
  """Soft indicator: 1 inside [lower, upper], decaying outside over margin.

  Semantics match reference dm_control/utils/rewards.py:92-134; `margin`,
  `bounds` and `value_at_margin` must be Python numbers (trace-time).
  """
  lower, upper = bounds
  if lower > upper:
    raise ValueError('lower bound must be <= upper bound')
  if margin < 0:
    raise ValueError('margin must be non-negative')
  x = jnp.asarray(x)
  in_bounds = jnp.logical_and(lower <= x, x <= upper)
  if margin == 0:
    return jnp.where(in_bounds, 1.0, 0.0)
  d = jnp.where(x < lower, lower - x, x - upper) / margin
  return jnp.where(in_bounds, 1.0, _sigmoid(d, value_at_margin, sigmoid))
