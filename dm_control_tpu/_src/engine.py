"""Engine facade: model loading + jitted step/forward builders.

The functional replacement for the reference's `mujoco.Physics` facade
(dm_control/mujoco/engine.py:90): where the reference wraps mutable
mjModel/mjData and steps them in place, here `load_model` returns a static
Model and `build_*` return pure jitted functions over Data pytrees.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from dm_control_tpu._src import forward as _forward
from dm_control_tpu._src import setconst
from dm_control_tpu._src.types import Data, Model
from dm_control_tpu.mjcf import compiler as _compiler


def load_model(path: str) -> Model:
  """Compile an MJCF file and finalize derived constants."""
  m = _compiler.compile_path(path)
  return setconst.set_const(m)


def load_model_from_string(xml: str, base_dir: str = '.') -> Model:
  m = _compiler.compile_string(xml, base_dir)
  return setconst.set_const(m)


def make_data(m: Model, dtype=None) -> Data:
  return _forward.make_data(m, dtype)


def build_step(m: Model) -> Callable[[Data], Data]:
  """Jitted physics step closure over the static model (cached on m)."""
  fn = getattr(m, '_step_jit', None)
  if fn is None:
    fn = jax.jit(functools.partial(_forward.step, m))
    m._step_jit = fn
  return fn


def build_forward(m: Model) -> Callable[[Data], Data]:
  fn = getattr(m, '_forward_jit', None)
  if fn is None:
    fn = jax.jit(functools.partial(_forward.forward, m))
    m._forward_jit = fn
  return fn


def reset_data(m: Model, d: Data, keyframe: Optional[int] = None) -> Data:
  """Reset state to qpos0 (or a keyframe), zero velocities/controls.

  Mirrors reference Physics.reset (dm_control/mujoco/engine.py:273-294).
  """
  dtype = d.qpos.dtype
  if keyframe is None:
    qpos = jnp.asarray(m.qpos0, dtype)
    qvel = jnp.zeros(m.nv, dtype)
    act = jnp.zeros(m.na, dtype)
  else:
    qpos = jnp.asarray(m.key_qpos[keyframe], dtype)
    qvel = jnp.asarray(m.key_qvel[keyframe], dtype)
    act = jnp.asarray(m.key_act[keyframe], dtype)
  return d.replace(
      qpos=qpos, qvel=qvel, act=act,
      ctrl=jnp.zeros(m.nu, dtype),
      qfrc_applied=jnp.zeros(m.nv, dtype),
      xfrc_applied=jnp.zeros((m.nbody, 6), dtype),
      time=jnp.zeros((), dtype),
      diverged=jnp.zeros((), bool))
