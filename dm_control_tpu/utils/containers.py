"""Tagged task registry (reference: dm_control/utils/containers.py:30-120)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional


class TaggedTasks:
  """Maps task names to factories, with tag-based lookup."""

  def __init__(self):
    self._tasks: Dict[str, Callable] = {}
    self._tags: Dict[str, List[str]] = {}

  def add(self, *tags: str):
    def wrap(factory):
      name = factory.__name__
      if name in self._tasks:
        raise ValueError(f'duplicate task {name!r}')
      self._tasks[name] = factory
      self._tags[name] = list(tags)
      return factory
    return wrap

  def tagged(self, *tags: str) -> Dict[str, Callable]:
    if not tags:
      return dict(self._tasks)
    return {n: f for n, f in self._tasks.items()
            if any(t in self._tags[n] for t in tags)}

  def tags(self, name: str) -> List[str]:
    return list(self._tags[name])

  def __getitem__(self, name: str) -> Callable:
    return self._tasks[name]

  def __contains__(self, name: str) -> bool:
    return name in self._tasks

  def __iter__(self):
    return iter(self._tasks)

  def keys(self):
    return self._tasks.keys()

  def items(self):
    return self._tasks.items()
