"""Composer: compositional task construction (reference L6, SURVEY §2.5).

Functional re-design of dm_control.composer:

  * `Entity` is a build-time object: an MJCF fragment plus observable
    definitions and pure lifecycle hooks.  `attach()` merges fragments
    with name prefixing at build time (replacing PyMJCF attachment
    frames, dm_control/mjcf/element.py:903-1046) - per-episode model
    RE-compilation is replaced by per-episode parameter overrides, so
    topology stays static under XLA.
  * The observation pipeline (Observable update_interval / buffer_size /
    delay / aggregator / corruptor, reference composer/observation/)
    becomes in-graph ring buffers advanced on every physics substep.
"""

from dm_control_tpu.composer.entity import Entity  # noqa: F401
from dm_control_tpu.composer.observation import (  # noqa: F401
    ObservableSpec, ObservationPipeline)
from dm_control_tpu.composer.task import ComposerTask  # noqa: F401
from dm_control_tpu.composer.environment import Environment  # noqa: F401
