"""dm_control_tpu: a TPU-native continuous-control environment engine.

A from-scratch JAX/XLA re-design of the capability surface of dm_control
(reference: johannah/dm_control): rigid-body physics in generalized
coordinates, Control Suite tasks as pure functions, batched `vmap`-parallel
environment stepping, and mesh-sharded multi-host scaling.

Layering (bottom up), mirroring SURVEY.md section 1 but functional:

  - `dm_control_tpu.mjcf`     : MJCF-subset XML -> static `Model` compiler
                                 (replaces reference L1/L2 ctypes bindings,
                                 dm_control/autowrap + mujoco/wrapper).
  - `dm_control_tpu._src`     : the physics engine: pure `forward`/`step`
                                 functions over (Model, Data) pytrees
                                 (replaces libmujoco200.so, reference L0).
  - `dm_control_tpu.rl`       : dm_env-compatible episode loop + specs
                                 (reference dm_control/rl/control.py).
  - `dm_control_tpu.suite`    : Control Suite tasks as pure functions
                                 (reference dm_control/suite/*).
  - `dm_control_tpu.parallel` : batched auto-reset runners, mesh sharding.
"""

__version__ = "0.1.0"

from dm_control_tpu._src import math  # noqa: F401
from dm_control_tpu._src.engine import (  # noqa: F401
    build_forward, build_step, load_model, load_model_from_string, make_data,
    reset_data)
from dm_control_tpu._src.types import Data, Model, Option  # noqa: F401
