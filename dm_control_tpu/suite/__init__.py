"""Control Suite: domain discovery + load()
(reference: dm_control/suite/__init__.py:50-155)."""

from __future__ import annotations

import importlib
import inspect
from typing import Optional

from dm_control_tpu.rl import control

_DOMAINS = [
    'acrobot', 'ball_in_cup', 'cartpole', 'cheetah', 'dog', 'finger',
    'fish', 'hopper', 'humanoid', 'humanoid_CMU', 'jaco', 'lqr', 'manipulator',
    'pendulum', 'point_mass', 'quadruped', 'reacher', 'stacker',
    'swimmer', 'walker',
]


def _get_domain(name: str):
  if name not in _DOMAINS:
    raise ValueError(f'unknown domain {name!r}; available: {_DOMAINS}')
  return importlib.import_module(f'dm_control_tpu.suite.{name}')


def _all_tasks():
  out = []
  for domain in _DOMAINS:
    mod = _get_domain(domain)
    for task in mod.SUITE:
      out.append((domain, task))
  return out


ALL_TASKS = _all_tasks()
BENCHMARKING = [
    (d, t) for d, t in ALL_TASKS
    if 'benchmarking' in _get_domain(d).SUITE.tags(t)]


def load(domain_name: str, task_name: str, task_kwargs: Optional[dict] = None,
         environment_kwargs: Optional[dict] = None,
         visualize_reward: bool = False) -> control.Environment:
  """Build a dm_env Environment for (domain, task)."""
  env = build_environment(domain_name, task_name, task_kwargs,
                          environment_kwargs)
  if visualize_reward and hasattr(env, 'set_reward_visualizer'):
    env.set_reward_visualizer(_reward_visualizer(env.task.model))
  return env


def _reward_visualizer(m):
  """data, reward -> data with self/effector/target geoms recolored
  (reference suite/base.py:100-112: rgba = r^4*highlight +
  (1-r^4)*default); the raytracer reads geom_rgba through model_var."""
  import jax.numpy as jnp
  import numpy as np

  mats = ('self', 'effector', 'target')
  names = getattr(m, 'geom_material', None) or []
  table = getattr(m, 'mat_rgba_by_name', {}) or {}
  idx = [g for g, n in enumerate(names) if n in mats]
  if not idx:
    return lambda d, reward: d
  default = np.stack([
      table.get(names[g] + '_default', np.asarray(m.geom_rgba[g]))
      for g in idx])
  highlight = np.stack([
      table.get(names[g] + '_highlight', np.asarray(m.geom_rgba[g]))
      for g in idx])
  gidx = np.asarray(idx)

  def viz(d, reward):
    from dm_control_tpu._src import smooth
    dtype = d.qpos.dtype
    r = jnp.clip(reward, 0.0, 1.0) ** 4
    blend = (r * jnp.asarray(highlight, dtype)
             + (1 - r) * jnp.asarray(default, dtype))
    rgba = smooth.mparam(m, d, 'geom_rgba').at[gidx].set(blend)
    mv = dict(d.model_var or {})
    mv['geom_rgba'] = rgba
    return d.replace(model_var=mv)

  return viz


def build_environment(domain_name: str, task_name: str,
                      task_kwargs=None, environment_kwargs=None):
  mod = _get_domain(domain_name)
  if task_name not in mod.SUITE:
    raise ValueError(
        f'unknown task {task_name!r} in domain {domain_name!r}')
  task_kwargs = dict(task_kwargs or {})
  if environment_kwargs is not None:
    task_kwargs['environment_kwargs'] = environment_kwargs
  return mod.SUITE[task_name](**task_kwargs)


def build_task(domain_name: str, task_name: str, **kwargs):
  """Return the underlying functional TaskDef (for batched runners)."""
  env = build_environment(domain_name, task_name, kwargs or None)
  return env.task
