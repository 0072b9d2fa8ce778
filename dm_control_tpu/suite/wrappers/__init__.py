"""Environment wrappers (reference: dm_control/suite/wrappers/)."""

from dm_control_tpu.suite.wrappers.action_noise import (  # noqa: F401
    Wrapper as ActionNoiseWrapper)
from dm_control_tpu.suite.wrappers.action_scale import (  # noqa: F401
    Wrapper as ActionScaleWrapper)
from dm_control_tpu.suite.wrappers.pixels import (  # noqa: F401
    Wrapper as PixelsWrapper)
from dm_control_tpu.suite.wrappers.profiling import (  # noqa: F401
    Wrapper as ProfilingWrapper)
