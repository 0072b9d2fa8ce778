"""Reusable composer entities (reference: dm_control/entities/)."""

from dm_control_tpu.entities import props  # noqa: F401
from dm_control_tpu.entities.manipulators import JacoArm  # noqa: F401
