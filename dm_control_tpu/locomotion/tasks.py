"""Locomotion tasks (reference: locomotion/tasks/go_to_target.py,
corridors.py).

Both build ComposerTasks over a walker entity + procedural arena; both
run single-env (composer.Environment) and batched
(composer.BatchedEnvironment)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer import variation as var
from dm_control_tpu.composer.environment import (BatchedEnvironment,
                                                 Environment)
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.composer.task import ComposerTask
from dm_control_tpu.locomotion import arenas
from dm_control_tpu.locomotion import walkers
from dm_control_tpu.utils import rewards


def _add_target_geom(arena):
  """Add a visual target site geom to an arena entity."""
  import xml.etree.ElementTree as ET
  wb = arena.mjcf_root.find('worldbody')
  ET.SubElement(wb, 'geom', dict(
      name='target', type='sphere', size='0.2', pos='0 0 0.2',
      contype='0', conaffinity='0', rgba='1 0 0 .5'))
  return arena


def go_to_target(batch_size=None, time_limit=25.0, random=None,
                 walker=None):
  """walker: any walker entity with a 'root' freejoint on its root frame
  (Ant by default; also walkers.Rat, walkers.CMUHumanoid)."""
  arena = _add_target_geom(arenas.floor(size=(8.0, 8.0)))
  # rebuild with the target in place
  walker = walker if walker is not None else walkers.Ant()
  task = ComposerTask(arena=arena, control_timestep=0.025)
  task.attach(walker)
  m = task.compile()
  obs, torso = walker.observables_for(m, 'walker')
  for name, spec in obs.items():
    task.add_observable(f'walker/{name}', spec)
  target_g = m.name2id('geom', 'target')
  free_root = 'walker/root' in m.names['joint']
  if free_root:
    root_q = int(m.jnt_qposadr[m.name2id('joint', 'walker/root')])
  else:  # planar walkers (jumping ball): root_x/root_y slide pair
    root_q = int(m.jnt_qposadr[m.name2id('joint', 'walker/root_x')])

  def target_pos(m_, d):
    return (d.model_var or {}).get(
        'geom_pos', jnp.asarray(m_.geom_pos, d.qpos.dtype))[target_g]

  task.add_observable('target', ObservableSpec(
      fn=lambda m_, d: target_pos(m_, d) - d.xpos[torso]))

  def init_episode(m_, d, key):
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = d.qpos.dtype
    txy = jax.random.uniform(k1, (2,), dtype, -6.0, 6.0)
    geom_pos = jnp.asarray(m_.geom_pos, dtype).at[target_g, :2].set(txy)
    wxy = jax.random.uniform(k2, (2,), dtype, -6.0, 6.0)
    qpos = d.qpos.at[root_q:root_q + 2].set(wxy)
    if free_root:  # random yaw only makes sense for a free root
      yaw = jax.random.uniform(k3, (), dtype, 0, 2 * np.pi)
      quat = jnp.stack([jnp.cos(yaw / 2), jnp.zeros_like(yaw),
                        jnp.zeros_like(yaw), jnp.sin(yaw / 2)])
      qpos = jax.lax.dynamic_update_slice(qpos, quat, (root_q + 3,))
    mv = dict(d.model_var or {})
    mv['geom_pos'] = geom_pos
    return d.replace(qpos=qpos, model_var=mv)

  task.add_init_hook(init_episode)
  task.set_reward(lambda m_, d: (jnp.linalg.norm(
      target_pos(m_, d)[:2] - d.xpos[torso, :2]) < 1.0).astype(
          d.qpos.dtype))
  task.set_termination(lambda m_, d: d.xpos[torso, 2] < 0.2)
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=time_limit)
  return Environment(task, time_limit=time_limit, random=random)


def random_goal_maze(n_cells=5, batch_size=None, time_limit=30.0,
                     random=None, maze_seed=0):
  """Goal-reaching in a procedural maze (reference
  tasks/random_goal_maze.py + arenas/mazes.py).  The maze topology is
  fixed at build time (one compiled model); the goal cell and walker
  spawn cell are drawn per episode from the maze's open cells —
  in-graph, so the batched path randomizes per lane."""
  arena, open_pos = arenas.maze(n_cells=n_cells, seed=maze_seed)
  arena = _add_target_geom(arena)
  walker = walkers.Ant()
  task = ComposerTask(arena=arena, control_timestep=0.025)
  task.attach(walker)
  m = task.compile()
  obs, torso = walker.observables_for(m, 'walker')
  for name, spec in obs.items():
    task.add_observable(f'walker/{name}', spec)
  target_g = m.name2id('geom', 'target')
  root_q = int(m.jnt_qposadr[m.name2id('joint', 'walker/root')])
  cells = jnp.asarray(open_pos)          # (K, 2) static

  def target_pos(m_, d):
    return (d.model_var or {}).get(
        'geom_pos', jnp.asarray(m_.geom_pos, d.qpos.dtype))[target_g]

  task.add_observable('target', ObservableSpec(
      fn=lambda m_, d: target_pos(m_, d) - d.xpos[torso]))

  def init_episode(m_, d, key):
    k1, k2 = jax.random.split(key)
    dtype = d.qpos.dtype
    idx = jax.random.choice(k1, cells.shape[0], (2,), replace=False)
    spawn = cells[idx[0]].astype(dtype)
    goal = cells[idx[1]].astype(dtype)
    geom_pos = jnp.asarray(m_.geom_pos, dtype).at[target_g, :2].set(goal)
    qpos = d.qpos.at[root_q:root_q + 2].set(spawn)
    mv = dict(d.model_var or {})
    mv['geom_pos'] = geom_pos
    return d.replace(qpos=qpos, model_var=mv)

  task.add_init_hook(init_episode)

  def reached(m_, d):
    return jnp.linalg.norm(
        target_pos(m_, d)[:2] - d.xpos[torso, :2]) < 0.8

  task.set_reward(lambda m_, d: reached(m_, d).astype(d.qpos.dtype))
  task.set_termination(lambda m_, d: jnp.logical_or(
      reached(m_, d), d.xpos[torso, 2] < 0.2))
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=time_limit)
  return Environment(task, time_limit=time_limit, random=random)


def escape(radius=8.0, depth=2.0, batch_size=None, time_limit=20.0,
           random=None):
  """Escape a heightfield bowl (reference tasks/escape.py:188 +
  arenas/bowl.py): reward is the linear tolerance on the walker's radial
  distance reaching the bowl rim (the suite quadruped escape reward
  shape, suite/quadruped.py:373-394)."""
  arena, heights = arenas.bowl(radius=radius, depth=depth)
  walker = walkers.Ant()
  task = ComposerTask(arena=arena, control_timestep=0.025)
  task.attach(walker)
  m = task.compile()
  obs, torso = walker.observables_for(m, 'walker')
  for name, spec in obs.items():
    task.add_observable(f'walker/{name}', spec)
  root_q = int(m.jnt_qposadr[m.name2id('joint', 'walker/root')])
  terrain = jnp.asarray(heights.ravel())

  task.add_observable('origin_distance', ObservableSpec(
      fn=lambda m_, d: jnp.linalg.norm(d.xpos[torso])[None]))

  def init_episode(m_, d, key):
    dtype = d.qpos.dtype
    mv = dict(d.model_var or {})
    mv['hfield_data'] = terrain.astype(dtype)
    # start near the bowl center, slightly above the terrain
    qpos = d.qpos.at[root_q + 2].set(jnp.asarray(0.7, dtype))
    return d.replace(qpos=qpos, model_var=mv)

  task.add_init_hook(init_episode)

  def get_reward(m_, d):
    r = jnp.linalg.norm(d.xpos[torso, :2])
    return rewards.tolerance(
        r, (radius, jnp.inf), margin=radius, sigmoid='linear',
        value_at_margin=0.0)

  task.set_reward(get_reward)
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=time_limit)
  return Environment(task, time_limit=time_limit, random=random)


def two_touch(batch_size=None, time_limit=20.0, random=None, walker=None,
              touch_interval=0.8, interval_tolerance=0.1,
              failure_timeout=1.2, touch_reward=0.2, timing_reward=1.0,
              aliveness_reward=0.0, z_height=0.14, target_radius=0.1,
              target_area=(0.3, 0.6)):
  """Reach task: tap a target twice with a timed interval (reference
  locomotion/tasks/reach.py TwoTouch, :37-370).  The reference's
  5-state trial machine (PRE_TOUCH / TOUCHED_ONCE / TOUCHED_TWICE /
  TOUCHED_TOO_SOON / NO_SECOND_TOUCH) runs in-graph: the state, the
  state-entry time and this step's reward pulse ride Data.model_var, so
  the task batches and auto-resets per lane.  Trials cycle within an
  episode — a terminal state returns to PRE_TOUCH after
  failure_timeout, as the reference cycles its target queue."""
  from dm_control_tpu.locomotion import props
  arena = arenas.floor(size=(2.0, 2.0))
  walker = walker if walker is not None else walkers.Rat()
  target = props.TargetSphere(radius=target_radius,
                              height_above_ground=z_height, name='target')
  # trigger bodies come from the walker entity (the reference resolves
  # 'lhand'/'rhand' then 'hand_L'/'hand_R', reach.py:70-74); walkers
  # without hands cannot run this task
  hands = getattr(walker, 'hand_bodies', None)
  if not hands:
    raise ValueError(
        f'two_touch requires a walker with hand bodies; '
        f'{type(walker).__name__} declares no hand_bodies attribute')
  target.install_hooks([f'{walker.name}/{b}' for b in hands])
  task = ComposerTask(arena=arena, control_timestep=0.03)
  task.attach(walker)
  task.attach(target)
  m = task.compile()
  obs, torso = walker.observables_for(m, 'walker')
  for name, spec in obs.items():
    task.add_observable(f'walker/{name}', spec)
  target_g = m.name2id('geom', 'target/target')
  root_q = int(m.jnt_qposadr[m.name2id('joint', 'walker/root')])

  def target_pos(m_, d):
    return (d.model_var or {}).get(
        'geom_pos', jnp.asarray(m_.geom_pos, d.qpos.dtype))[target_g]

  def tt_state(d):
    return (d.model_var or {}).get(
        'tt_state', jnp.zeros(3, d.qpos.dtype))

  task.add_observable('target', ObservableSpec(
      fn=lambda m_, d: target_pos(m_, d) - d.xpos[torso]))
  task.add_observable('task_state', ObservableSpec(
      fn=lambda m_, d: tt_state(d)[:2]))

  def init_episode(m_, d, key):
    k1, k2 = jax.random.split(key)
    dtype = d.qpos.dtype
    # rectangle with half-extents target_area, as the reference's
    # _randomize_targets does (reach.py TwoTouch: uniform over
    # [-area[0], area[0]] x [-area[1], area[1]])
    tx = jax.random.uniform(k1, (), dtype, -target_area[0], target_area[0])
    ty = jax.random.uniform(k2, (), dtype, -target_area[1], target_area[1])
    txy = jnp.stack([tx, ty])
    geom_pos = jnp.asarray(m_.geom_pos, dtype).at[target_g, :2].set(txy)
    mv = dict(d.model_var or {})
    mv['geom_pos'] = geom_pos
    mv['tt_state'] = jnp.zeros(3, dtype)
    return d.replace(model_var=mv, qpos=d.qpos.at[root_q + 2].set(
        jnp.asarray(0.06, dtype)))

  task.add_init_hook(init_episode)

  def state_machine(m_, d, key, prefix):
    """after_step: advance the two-touch trial machine.  tt_state =
    [state, state-entry time, reward pulse this step]."""
    mv = dict(d.model_var or {})
    dtype = d.qpos.dtype
    st = mv.get('tt_state', jnp.zeros(3, dtype))
    state, t0 = st[0], st[1]
    touch = target.touching(m_, d, 'target')
    dt = d.time - t0
    in_pre = state < 0.5
    in_once = jnp.logical_and(state > 0.5, state < 1.5)
    terminal = state > 1.5
    to_once = jnp.logical_and(in_pre, touch)
    to_twice = jnp.logical_and(
        in_once, jnp.logical_and(
            touch, jnp.abs(dt - touch_interval) <= interval_tolerance))
    to_soon = jnp.logical_and(in_once, jnp.logical_and(
        touch, dt < touch_interval - interval_tolerance))
    to_nosecond = jnp.logical_and(in_once, jnp.logical_and(
        jnp.logical_not(touch), dt > touch_interval + interval_tolerance))
    trial_reset = jnp.logical_and(terminal, dt > failure_timeout)
    new_state = jnp.where(to_once, 1.0, state)
    new_state = jnp.where(to_twice, 2.0, new_state)
    new_state = jnp.where(to_soon, 3.0, new_state)
    new_state = jnp.where(to_nosecond, 4.0, new_state)
    new_state = jnp.where(trial_reset, 0.0, new_state)
    entered = jnp.logical_or(jnp.logical_or(to_once, to_twice),
                             jnp.logical_or(to_soon, to_nosecond))
    new_t0 = jnp.where(entered, d.time, t0)
    pulse = (touch_reward * to_once.astype(dtype)
             + timing_reward * to_twice.astype(dtype))
    mv['tt_state'] = jnp.stack([new_state.astype(dtype), new_t0, pulse])
    return d.replace(model_var=mv)

  arena.after_step_hook = state_machine
  task.set_reward(lambda m_, d: tt_state(d)[2] + aliveness_reward)
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=time_limit)
  return Environment(task, time_limit=time_limit, random=random)


def run_through_corridor(corridor='empty', target_velocity=3.0,
                         batch_size=None, time_limit=30.0, random=None):
  """RunThroughCorridor (reference tasks/corridors.py): reward is the
  linear tolerance on the walker's forward velocity."""
  maker = dict(empty=arenas.empty_corridor, gaps=arenas.gaps_corridor,
               walls=arenas.walls_corridor)[corridor]
  arena = maker()
  walker = walkers.Ant()
  task = ComposerTask(arena=arena, control_timestep=0.025)
  task.attach(walker)
  m = task.compile()
  obs, torso = walker.observables_for(m, 'walker')
  for name, spec in obs.items():
    task.add_observable(f'walker/{name}', spec)
  root_q = int(m.jnt_qposadr[m.name2id('joint', 'walker/root')])
  root_d = int(m.jnt_dofadr[m.name2id('joint', 'walker/root')])

  def init_episode(m_, d, key):
    qpos = d.qpos.at[root_q:root_q + 2].set(
        jnp.asarray([1.0, 0.0], d.qpos.dtype))
    return d.replace(qpos=qpos)

  task.add_init_hook(init_episode)

  def get_reward(m_, d):
    xvel = d.qvel[root_d]
    return rewards.tolerance(
        xvel, (target_velocity, target_velocity), margin=target_velocity,
        sigmoid='linear', value_at_margin=0.0)

  task.set_reward(get_reward)
  task.set_termination(lambda m_, d: d.xpos[torso, 2] < 0.2)
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=time_limit)
  return Environment(task, time_limit=time_limit, random=random)
