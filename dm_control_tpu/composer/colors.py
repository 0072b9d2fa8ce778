"""Color variations: RGB / HSV / gray-level RGBA generators.

Functional analog of the reference's composer/variation/colors.py:20-79
(RgbVariation, HsvVariation, GrayVariation): each channel may itself be
a Variation (or a constant), evaluated with an explicit PRNG key, and the
result is a 4-vector RGBA — jit/vmap-safe, so material colors can vary
per episode inside the batched composer reset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dm_control_tpu.composer.variation import Variation, evaluate


def _eval_channels(channels, key, initial_value, current_value):
  keys = jax.random.split(key, len(channels))
  return [evaluate(c, k, initial_value, current_value)
          for c, k in zip(channels, keys)]


def hsv_to_rgb(h, s, v):
  """Branch-free HSV -> RGB (colorsys.hsv_to_rgb semantics, jit-safe)."""
  h = jnp.asarray(h) % 1.0
  i = jnp.floor(h * 6.0)
  f = h * 6.0 - i
  p = v * (1.0 - s)
  q = v * (1.0 - s * f)
  t = v * (1.0 - s * (1.0 - f))
  i = i.astype(jnp.int32) % 6
  r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [v, q, p, p, t, v])
  g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [t, v, v, q, p, p])
  b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [p, p, t, v, v, q])
  return r, g, b


class RgbVariation(Variation):
  """Independent variations of R, G, B (+ alpha) -> RGBA vector."""

  def __init__(self, r, g, b, alpha=1.0):
    self._channels = (r, g, b, alpha)

  def __call__(self, key, initial_value=None, current_value=None):
    vals = _eval_channels(self._channels, key, initial_value, current_value)
    return jnp.stack([jnp.asarray(v, jnp.result_type(float)) for v in vals])


class HsvVariation(Variation):
  """Independent variations of H, S, V (+ alpha) -> RGBA vector."""

  def __init__(self, h, s, v, alpha=1.0):
    self._channels = (h, s, v, alpha)

  def __call__(self, key, initial_value=None, current_value=None):
    h, s, v, alpha = _eval_channels(self._channels, key, initial_value,
                                    current_value)
    r, g, b = hsv_to_rgb(h, s, v)
    return jnp.stack([jnp.asarray(x, jnp.result_type(float))
                      for x in (r, g, b, alpha)])


class GrayVariation(HsvVariation):
  """Gray-level (+ alpha) variation -> RGBA vector."""

  def __init__(self, gray_level, alpha=1.0):
    super().__init__(h=0.0, s=0.0, v=gray_level, alpha=alpha)
