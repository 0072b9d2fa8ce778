"""MJCF-subset model compiler: XML -> static `Model` arrays at build time.

Replaces the reference's install-time ctypes codegen + native model compile
(dm_control/autowrap/*, dm_control/mujoco/wrapper/core.py:300-364): instead
of parsing C headers and calling mj_loadXML, we parse the MJCF XML directly
and emit the packed numpy arrays of `dm_control_tpu._src.types.Model`.
All name resolution happens here, at build time, so the engine is fully
static under jit (the analog of the reference's `sizes.py` shape metadata,
dm_control/mujoco/index.py:16-33).
"""

from dm_control_tpu.mjcf.compiler import compile_path, compile_string  # noqa: F401
from dm_control_tpu.mjcf.physics import Binding, bind  # noqa: F401
