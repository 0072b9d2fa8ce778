"""Control Suite environments explorer (reference suite/explore.py:1-76).

Interactive entry point: pick a `domain.task` (argument or prompt), then
launch the browser viewer on it with optional action noise / no-timeout /
reward visualization — the reference's flags become plain kwargs/argv.

Usage:
  python -m dm_control_tpu.suite.explore [domain.task] [--no-timeout]
      [--no-visualize-reward] [--action-noise=0.3] [--port=N]
or from Python:
  from dm_control_tpu.suite import explore
  explore.explore('cartpole.swingup')
"""

from __future__ import annotations

import sys

from dm_control_tpu import suite

ALL_NAMES = ['.'.join(dt) for dt in suite.ALL_TASKS]


def prompt_environment_name(prompt: str, values) -> str:
  name = None
  while not name:
    name = input(prompt)
    if name not in values:
      print(f'{name!r} is not a valid environment name.')
      name = None
  return name


def explore(environment_name: str = None, timeout: bool = True,
            visualize_reward: bool = True, action_noise: float = 0.0,
            port: int = 0, serve: bool = True):
  """Load a suite env by 'domain.task' name and launch the viewer."""
  if environment_name is None:
    print('\n  '.join(['Available environments:'] + ALL_NAMES))
    environment_name = prompt_environment_name(
        'Please select an environment name: ', ALL_NAMES)
  if environment_name not in ALL_NAMES:
    raise ValueError(f'unknown environment {environment_name!r}; '
                     f'expected one of {ALL_NAMES}')
  domain_name, task_name = environment_name.split('.')

  task_kwargs = {}
  if not timeout:
    task_kwargs['time_limit'] = float('inf')
  env = suite.load(domain_name, task_name, task_kwargs=task_kwargs)
  if hasattr(env, 'task'):
    env.task.visualize_reward = visualize_reward
  if action_noise > 0:
    from dm_control_tpu.suite.wrappers import action_noise as noise_mod
    env = noise_mod.Wrapper(env, scale=action_noise)

  from dm_control_tpu.viewer_app import InteractiveViewer
  viewer = InteractiveViewer(env, port=port or 8844)
  if serve:
    viewer.serve()
  return viewer


def main(argv=None):
  argv = list(sys.argv[1:] if argv is None else argv)
  kwargs = {}
  name = None
  for a in argv:
    if a == '--no-timeout':
      kwargs['timeout'] = False
    elif a == '--no-visualize-reward':
      kwargs['visualize_reward'] = False
    elif a.startswith('--action-noise='):
      kwargs['action_noise'] = float(a.split('=', 1)[1])
    elif a.startswith('--port='):
      kwargs['port'] = int(a.split('=', 1)[1])
    else:
      name = a
  explore(name, **kwargs)


if __name__ == '__main__':
  main()
