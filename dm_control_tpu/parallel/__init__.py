"""Batched, sharded environment execution - the TPU-native hot path.

Replaces the reference's one-process-per-env execution model
(dm_control/mujoco/engine.py:24 "Each Physics instance defines a simulated
world"; SURVEY.md section 2.2) with vmapped lockstep batches, in-graph
auto-reset, and jax.sharding mesh parallelism across chips/hosts.
"""

from dm_control_tpu.parallel.runner import (  # noqa: F401
    BatchedEnv, RunnerState, rollout)
