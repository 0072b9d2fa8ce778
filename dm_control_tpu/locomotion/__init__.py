"""Locomotion tier: walkers, procedural arenas, tasks
(reference: dm_control/locomotion/)."""

from dm_control_tpu.locomotion import arenas  # noqa: F401
from dm_control_tpu.locomotion import mocap  # noqa: F401
from dm_control_tpu.locomotion import props  # noqa: F401
from dm_control_tpu.locomotion import rescale  # noqa: F401
from dm_control_tpu.locomotion import soccer  # noqa: F401
from dm_control_tpu.locomotion import tasks  # noqa: F401
from dm_control_tpu.locomotion import tracking  # noqa: F401
from dm_control_tpu.locomotion import walkers  # noqa: F401
