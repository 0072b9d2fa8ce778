"""Action rescaling wrapper
(reference: dm_control/suite/wrappers/action_scale.py:33)."""

from __future__ import annotations

import dm_env
from dm_env import specs
import numpy as np


class Wrapper(dm_env.Environment):
  """Affinely maps actions from [minimum, maximum] to the env's bounds."""

  def __init__(self, env, minimum, maximum):
    spec = env.action_spec()
    minimum = np.broadcast_to(minimum, spec.shape).astype(spec.dtype)
    maximum = np.broadcast_to(maximum, spec.shape).astype(spec.dtype)
    if not (np.all(np.isfinite(spec.minimum))
            and np.all(np.isfinite(spec.maximum))):
      raise ValueError('env action bounds must be finite to rescale')
    scale = (spec.maximum - spec.minimum) / (maximum - minimum)

    def transform(action):
      return spec.minimum + scale * (np.asarray(action) - minimum)

    self._transform = transform
    self._action_spec = specs.BoundedArray(
        shape=spec.shape, dtype=spec.dtype, minimum=minimum,
        maximum=maximum, name=spec.name)
    self._env = env

  def step(self, action):
    return self._env.step(self._transform(action))

  def reset(self):
    return self._env.reset()

  def observation_spec(self):
    return self._env.observation_spec()

  def action_spec(self):
    return self._action_spec

  def __getattr__(self, name):
    return getattr(self._env, name)
