"""Pixel-observation wrapper (reference: dm_control/suite/wrappers/pixels.py:29-80)
backed by the in-graph raytracer instead of OpenGL."""

from __future__ import annotations

import collections

import dm_env
from dm_env import specs
import jax
import numpy as np

from dm_control_tpu._src import render as _render


class Wrapper(dm_env.Environment):
  """Adds (or replaces observations with) a rendered 'pixels' entry."""

  def __init__(self, env, pixels_only: bool = True,
               render_kwargs: dict | None = None,
               observation_key: str = 'pixels'):
    render_kwargs = dict(render_kwargs or {})
    render_kwargs.setdefault('height', 64)
    render_kwargs.setdefault('width', 64)
    render_kwargs.setdefault('camera_id', 0)
    self._env = env
    self._pixels_only = pixels_only
    self._key = observation_key
    m = env.task.model
    if m.ncam == 0:
      raise ValueError('model has no cameras to render from')
    self._render = jax.jit(
        lambda d: _render.render(m, d, **render_kwargs))
    self._shape = (render_kwargs['height'], render_kwargs['width'], 3)

  def _add_pixels(self, ts):
    obs = collections.OrderedDict() if self._pixels_only else (
        collections.OrderedDict(ts.observation))
    frame = np.asarray(self._render(self._env.physics))
    obs[self._key] = (frame * 255).astype(np.uint8)
    return ts._replace(observation=obs)

  def reset(self):
    return self._add_pixels(self._env.reset())

  def step(self, action):
    ts = self._env.step(action)
    if self._env.physics is None:  # episode ended; reuse terminal obs
      obs = collections.OrderedDict() if self._pixels_only else (
          collections.OrderedDict(ts.observation))
      obs[self._key] = np.zeros(self._shape, np.uint8)
      return ts._replace(observation=obs)
    return self._add_pixels(ts)

  def observation_spec(self):
    out = (collections.OrderedDict() if self._pixels_only
           else collections.OrderedDict(self._env.observation_spec()))
    out[self._key] = specs.Array(shape=self._shape, dtype=np.uint8,
                                 name=self._key)
    return out

  def action_spec(self):
    return self._env.action_spec()

  def __getattr__(self, name):
    return getattr(self._env, name)
