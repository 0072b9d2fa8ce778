"""Additive Gaussian action noise wrapper
(reference: dm_control/suite/wrappers/action_noise.py:30)."""

from __future__ import annotations

import dm_env
import numpy as np

_BOUNDS_MUST_BE_FINITE = (
    'All bounds in `env.action_spec()` must be finite, got: {spec}')


class Wrapper(dm_env.Environment):
  """Scales i.i.d. Gaussian noise by the action range and adds it."""

  def __init__(self, env, scale: float = 0.01, random=None):
    spec = env.action_spec()
    if not (np.all(np.isfinite(spec.minimum))
            and np.all(np.isfinite(spec.maximum))):
      raise ValueError(_BOUNDS_MUST_BE_FINITE.format(spec=spec))
    self._minimum = spec.minimum
    self._maximum = spec.maximum
    self._noise_std = scale * (spec.maximum - spec.minimum)
    self._env = env
    self._random = (random if isinstance(random, np.random.RandomState)
                    else np.random.RandomState(random))

  def step(self, action):
    noisy = action + self._random.normal(scale=self._noise_std)
    np.clip(noisy, self._minimum, self._maximum, out=noisy)
    return self._env.step(noisy)

  def reset(self):
    return self._env.reset()

  def observation_spec(self):
    return self._env.observation_spec()

  def action_spec(self):
    return self._env.action_spec()

  def __getattr__(self, name):
    return getattr(self._env, name)
