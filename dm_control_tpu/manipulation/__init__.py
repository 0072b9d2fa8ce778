"""Manipulation tier: single-arm (Jaco) prop tasks
(reference: dm_control/manipulation/).

`load(name)` over a tagged registry, mirroring the reference entry point
(manipulation/__init__.py:64-79).  Tasks compose the Jaco arm entity with
an arena, primitive props, and target sites through the composer layer;
all feature-observation variants are provided (the reference's vision
variants correspond to attaching the in-graph raytracer)."""

from dm_control_tpu.manipulation import tasks as _tasks

ALL = tuple(sorted(_tasks.REGISTRY))
TAGS = tuple(sorted({t for tags in _tasks.TAGS.values() for t in tags}))


def get_environments_by_tag(tag):
  return tuple(sorted(n for n, tags in _tasks.TAGS.items() if tag in tags))


def load(environment_name, seed=None):
  if environment_name not in _tasks.REGISTRY:
    raise ValueError(
        f'unknown environment {environment_name!r}; available: {ALL}')
  return _tasks.REGISTRY[environment_name](random=seed)
