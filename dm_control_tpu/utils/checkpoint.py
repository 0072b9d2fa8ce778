"""Checkpoint/restore for state pytrees.

The reference checkpoints by pickling the entire native mjData buffer
(dm_control/mujoco/wrapper/core.py:640-672); here the State pytree IS the
checkpoint (SURVEY.md section 5): any engine Data / RunnerState / learner
state saves as a flat npz with its treedef recorded for validation.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any) -> None:
  leaves, treedef = jax.tree_util.tree_flatten(tree)
  arrays = {f'leaf_{i}': np.asarray(x) for i, x in enumerate(leaves)}
  np.savez_compressed(path, __treedef__=np.frombuffer(
      str(treedef).encode(), dtype=np.uint8), **arrays)


def restore(path: str, like: Any) -> Any:
  """Restore into the structure of `like` (shapes/treedef must match)."""
  data = np.load(path)
  leaves, treedef = jax.tree_util.tree_flatten(like)
  saved_def = bytes(data['__treedef__']).decode()
  if saved_def != str(treedef):
    raise ValueError(
        f'checkpoint treedef mismatch:\nsaved: {saved_def}\n'
        f'expected: {treedef}')
  out = []
  for i, leaf in enumerate(leaves):
    arr = data[f'leaf_{i}']
    if np.shape(leaf) != arr.shape:
      raise ValueError(f'leaf {i} shape {arr.shape} != {np.shape(leaf)}')
    out.append(arr)
  return jax.tree_util.tree_unflatten(treedef, out)
