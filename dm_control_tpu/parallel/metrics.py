"""Runner observability: steps/s, resets/s, divergence counters.

The reference has no metrics backend (SURVEY.md section 5); its viewer
shows per-frame FPS.  Here the batched runner exposes structured
counters a trainer can log or assert on.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict

import jax
import numpy as np


@dataclasses.dataclass
class Meter:
  """Accumulates throughput/episode statistics across runner steps."""
  batch_size: int
  t_start: float = dataclasses.field(default_factory=time.perf_counter)
  steps: int = 0
  episodes: int = 0
  divergences: int = 0
  reward_sum: float = 0.0

  def update(self, done, reward, diverged=None) -> None:
    self.steps += 1
    self.episodes += int(np.sum(np.asarray(done)))
    self.reward_sum += float(np.sum(np.asarray(reward)))
    if diverged is not None:
      self.divergences += int(np.sum(np.asarray(diverged)))

  def snapshot(self) -> Dict[str, float]:
    dt = max(time.perf_counter() - self.t_start, 1e-9)
    env_steps = self.steps * self.batch_size
    return dict(
        env_steps=env_steps,
        env_steps_per_sec=env_steps / dt,
        episodes=self.episodes,
        episodes_per_sec=self.episodes / dt,
        divergences=self.divergences,
        mean_reward=self.reward_sum / max(env_steps, 1),
        wall_seconds=dt,
    )
