"""Step-timing wrapper (reference: dm_control/suite/wrappers/mujoco_profiling.py:30-110).

The reference surfaces the native step timer (data.timer, enabled via
mjcb_time) as an observation; here the equivalent is host-side wall-clock
accounting around the jitted step, exposed the same way as a
'step_timing' observation [cumulative seconds, call count].
"""

from __future__ import annotations

import collections
import time

import dm_env
from dm_env import specs
import numpy as np


class Wrapper(dm_env.Environment):
  """Adds a 'step_timing' observation: [total step seconds, step count]."""

  def __init__(self, env):
    self._env = env
    self._total = 0.0
    self._count = 0

  def reset(self):
    self._total = 0.0
    self._count = 0
    ts = self._env.reset()
    return self._add(ts)

  def step(self, action):
    t0 = time.perf_counter()
    ts = self._env.step(action)
    self._total += time.perf_counter() - t0
    self._count += 1
    return self._add(ts)

  def _add(self, ts):
    obs = collections.OrderedDict(ts.observation)
    obs['step_timing'] = np.array([self._total, float(self._count)])
    return ts._replace(observation=obs)

  def observation_spec(self):
    out = collections.OrderedDict(self._env.observation_spec())
    out['step_timing'] = specs.Array(shape=(2,), dtype=np.float64,
                                     name='step_timing')
    return out

  def action_spec(self):
    return self._env.action_spec()

  def __getattr__(self, name):
    return getattr(self._env, name)
