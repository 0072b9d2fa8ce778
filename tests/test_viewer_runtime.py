"""Viewer runtime state machine (reference viewer/runtime.py:88-258,
util.py:57-100)."""

import numpy as np

from dm_control_tpu import suite, viewer


def _env():
  return suite.load('pendulum', 'swingup', task_kwargs={'random': 0})


def test_runtime_lifecycle_and_pacing():
  rt = viewer.Runtime(_env(), policy=lambda ts: np.zeros(1))
  assert rt.state == viewer.State.START
  began = []
  rt.on_episode_begin.append(lambda: began.append(1))
  rt.tick(time_elapsed=0.1)
  assert rt.state == viewer.State.RUNNING
  assert began == [1]
  t0 = rt.get_time()
  rt.tick(time_elapsed=0.2)
  assert rt.get_time() > t0
  rt.stop()
  assert rt.state == viewer.State.STOPPED


def test_runtime_single_step_and_restart():
  rt = viewer.Runtime(_env(), policy=lambda ts: np.zeros(1))
  assert rt.single_step()
  t = rt.get_time()
  assert rt.single_step()
  assert rt.get_time() > t
  rt.restart()
  assert rt.state == viewer.State.RUNNING
  assert rt.get_time() == 0.0


def test_time_multiplier_bounds():
  tm = viewer.TimeMultiplier(1.0)
  for _ in range(10):
    tm.increase()
  assert tm.get() == 2.0
  for _ in range(20):
    tm.decrease()
  assert tm.get() == 1.0 / 32
  assert str(tm) == '1/32'


def test_runtime_traps_policy_errors():
  def bad_policy(ts):
    raise RuntimeError('boom')
  rt = viewer.Runtime(_env(), policy=bad_policy)
  rt.tick(time_elapsed=0.1)
  assert rt.state == viewer.State.STOPPED
  assert 'boom' in rt.last_error
