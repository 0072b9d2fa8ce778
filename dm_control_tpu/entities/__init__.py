"""Reusable composer entities (reference: dm_control/entities/)."""

from dm_control_tpu.entities import props  # noqa: F401
from dm_control_tpu.entities.duplo import duplo_entity  # noqa: F401
from dm_control_tpu.entities.manipulators import (JacoArm,  # noqa: F401
                                                  JacoHand)
from dm_control_tpu.entities.manipulators_base import (  # noqa: F401
    DOWN_QUATERNION, RobotArm, RobotHand)
