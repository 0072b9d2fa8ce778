"""Multi-agent MuJoCo soccer, TPU-native (reference:
locomotion/soccer/{__init__,task,pitch,boxhead,soccer_ball,team,
observables,initializers}.py).

Differences from the reference are architectural, not behavioral:

  * the BoxHead walker and the pitch are generated procedurally (no
    texture/PNG assets; team identity is an rgba marker);
  * goal / off-court detection is in-graph (static goal AABBs tested
    against the ball position every control step) instead of host-side
    mjcf position-detector callbacks (reference pitch.py:558-582);
  * rewards are a single (n_players,) vector (+1 scoring team, -1
    conceding team, 0 otherwise — reference task.py:169-186) rather
    than a Python list, so the whole game steps under one jit and
    batches with vmap;
  * per-player observations are pure functions of (Model, Data) in the
    player's yaw-aligned egocentric frame (the role of reference
    observables.py CoreObservablesAdder).

Actions are the flat ctrl vector; per-player slices are exposed via
`player_action_slices` (3 actuators per player: roll, steer, kick).
"""

from __future__ import annotations

import dataclasses
import enum
import xml.etree.ElementTree as ET
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.environment import (BatchedEnvironment,
                                                 Environment)
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.composer.task import ComposerTask

_RGBA_HOME = '0.1 0.1 0.8 1'
_RGBA_AWAY = '0.8 0.1 0.1 1'
_BALL_RADIUS = 0.35
_GOAL_DEPTH = 1.2
_WALL_HEIGHT = 3.0
_WALL_THICKNESS = 0.25


class Team(enum.Enum):
  HOME = 'home'   # attacks the +x goal
  AWAY = 'away'   # attacks the -x goal


@dataclasses.dataclass(frozen=True)
class Player:
  team: Team
  name: str           # entity prefix, e.g. 'home0'
  act_slice: slice    # this player's columns of the flat ctrl vector


def _boxhead_xml(marker_rgba):
  """An actuated rolling ball with a box head (reference boxhead.xml
  semantics: slide-xyz root + steer hinge so the walker never tips,
  roll wheel for forward drive, spring-loaded kick slide)."""
  root = ET.Element('mujoco')
  wb = ET.SubElement(root, 'worldbody')
  body = ET.SubElement(wb, 'body', dict(name='head_body', pos='0 0 1.05'))
  for ax, nm in ((('1 0 0'), 'root_x'), (('0 1 0'), 'root_y'),
                 (('0 0 1'), 'root_z')):
    ET.SubElement(body, 'joint', dict(name=nm, type='slide', axis=ax))
  ET.SubElement(body, 'joint', dict(
      name='steer', type='hinge', axis='0 0 -1', damping='4'))
  ET.SubElement(body, 'geom', dict(
      name='head', type='box', size='0.2 0.2 0.1', mass='20',
      rgba='.1 .1 .1 1', condim='4', friction='.5 .02 .02'))
  torso = ET.SubElement(body, 'body', dict(name='torso', pos='0 0 0.05'))
  ET.SubElement(torso, 'joint', dict(
      name='kick', type='slide', axis='0 0 -1', damping='100',
      limited='true', range='0 0.4'))
  for side, sy in (('l', 1.0), ('r', -1.0)):
    ET.SubElement(torso, 'geom', dict(
        name=f'arm_{side}', type='capsule', size='0.1',
        fromto=f'0 {0.35 * sy} -0.7 0.03 {0.8 * sy} -0.7',
        density='10', rgba=marker_rgba))
  ball = ET.SubElement(torso, 'body', dict(name='wheel', pos='0 0 -0.7'))
  ET.SubElement(ball, 'joint', dict(
      name='roll', type='hinge', axis='0 1 0', damping='2'))
  ET.SubElement(ball, 'geom', dict(
      name='shell', type='sphere', size='0.35', density='100',
      condim='4', friction='.5 .02 .02', rgba=marker_rgba))
  act = ET.SubElement(root, 'actuator')
  ET.SubElement(act, 'motor', dict(
      name='roll', joint='roll', gear='-30', ctrllimited='true',
      ctrlrange='-1 1'))
  ET.SubElement(act, 'motor', dict(
      name='steer', joint='steer', gear='55', ctrllimited='true',
      ctrlrange='-1 1'))
  ET.SubElement(act, 'motor', dict(
      name='kick', joint='kick', gear='1200', ctrllimited='true',
      ctrlrange='-1 1'))
  return root


def _soccer_ball_xml():
  """Free sphere, FIFA size-5-ish (reference soccer_ball.py:42: radius
  0.35 scaled pitch units, mass 0.045, high-bounce solref)."""
  root = ET.Element('mujoco')
  wb = ET.SubElement(root, 'worldbody')
  body = ET.SubElement(wb, 'body', dict(name='ball', pos='0 0 0.4'))
  ET.SubElement(body, 'freejoint', dict(name='ball_root'))
  ET.SubElement(body, 'geom', dict(
      name='ball_geom', type='sphere', size=str(_BALL_RADIUS),
      mass='0.045', condim='6', friction='0.7 0.005 0.0001',
      solref='0.02 0.6', rgba='1 1 1 1'))
  return root


def _pitch_xml(size: Tuple[float, float], goal_size: Tuple[float, float]):
  """Plane + bounding walls with goal openings at +-x and box 'net'
  enclosures behind them (reference pitch.py:108-148 fieldbox)."""
  length, width = size
  gw, gh = goal_size            # goal half-width, height
  t = _WALL_THICKNESS
  h = _WALL_HEIGHT
  root = ET.Element('mujoco')
  ET.SubElement(root, 'option', dict(timestep='0.005'))
  wb = ET.SubElement(root, 'worldbody')
  ET.SubElement(wb, 'geom', dict(
      name='ground', type='plane', size=f'{length + 3} {width + 3} 0.1',
      friction='1 0.005 0.0001'))

  def box(name, pos, sz, rgba='.5 .5 .5 1'):
    ET.SubElement(wb, 'geom', dict(
        name=name, type='box',
        pos=f'{pos[0]} {pos[1]} {pos[2]}',
        size=f'{sz[0]} {sz[1]} {sz[2]}', rgba=rgba))

  # side walls (full length incl. goal depth)
  lx = length + _GOAL_DEPTH + 2 * t
  for nm, sy in (('wall_near', -1.0), ('wall_far', 1.0)):
    box(nm, (0, sy * (width + t), h / 2), (lx, t, h / 2))
  # end walls with a gw x gh opening centred at y=0
  cy = 0.5 * (width + gw)       # corner segment centre / half-size
  cs = 0.5 * (width - gw)
  for nm, sx in (('left', -1.0), ('right', 1.0)):
    x = sx * (length + t)
    box(f'wall_{nm}_a', (x, -(gw + cs), h / 2), (t, cs, h / 2))
    box(f'wall_{nm}_b', (x, gw + cs, h / 2), (t, cs, h / 2))
    box(f'wall_{nm}_top', (x, 0, gh + (h - gh) / 2),
        (t, gw, (h - gh) / 2))
    # net enclosure behind the opening
    bx = sx * (length + _GOAL_DEPTH + t)
    box(f'net_{nm}_back', (bx, 0, gh / 2), (t, gw + 2 * t, gh / 2))
    for sfx, sy in (('l', -1.0), ('r', 1.0)):
      box(f'net_{nm}_{sfx}', (sx * (length + t + _GOAL_DEPTH / 2),
                              sy * (gw + t), gh / 2),
          (_GOAL_DEPTH / 2, t, gh / 2))
    box(f'net_{nm}_roof', (sx * (length + t + _GOAL_DEPTH / 2), 0,
                           gh + t / 2), (_GOAL_DEPTH / 2, gw + 2 * t,
                                         t / 2))
  del cy
  return root


def _yaw_rot(yaw):
  """World->ego rotation for a heading angle about -z (steer axis)."""
  c, s = jnp.cos(yaw), jnp.sin(yaw)
  return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


class Task(ComposerTask):
  """2-team soccer over a static or per-episode-randomized pitch; see
  module docstring."""

  def __init__(self, team_size=1, pitch_size=(12.0, 9.0),
               goal_size=(3.0, 1.0), control_timestep=0.025,
               walker_fn=_boxhead_xml, randomize_pitch=None):
    """randomize_pitch: optional (min_scale, max_scale) with
    max_scale <= 1: each episode draws independent x/y scale factors
    and moves the walls/goals inward via the Data.model_var geom_pos
    overlay (the reference's RandomizedPitch, pitch.py:605, rebuilds
    MJCF per episode and therefore cannot batch; moving statically
    oversized walls keeps the whole batch under one trace)."""
    super().__init__(arena=Entity(mjcf_root=_pitch_xml(
        pitch_size, goal_size), name='pitch'),
        control_timestep=control_timestep)
    self.team_size = team_size
    self.pitch_size = pitch_size
    self.goal_size = goal_size
    self.randomize_pitch = randomize_pitch
    if randomize_pitch is not None:
      lo_s, hi_s = randomize_pitch
      if not 0.0 < lo_s <= hi_s <= 1.0:
        raise ValueError('randomize_pitch scales must satisfy '
                         f'0 < min <= max <= 1, got {randomize_pitch}')
    self.players = []
    for team, rgba in ((Team.HOME, _RGBA_HOME), (Team.AWAY, _RGBA_AWAY)):
      for i in range(team_size):
        name = f'{team.value}{i}'
        self.attach(Entity(mjcf_root=walker_fn(rgba), name=name))
        self.players.append(Player(team, name, slice(0, 0)))
    ball_entity = Entity(mjcf_root=_soccer_ball_xml(), name='ball')
    self.attach(ball_entity)
    m = self.compile()
    nu_per = 3
    self.players = [
        dataclasses.replace(p, act_slice=slice(i * nu_per,
                                               (i + 1) * nu_per))
        for i, p in enumerate(self.players)]

    # --- static indices -------------------------------------------------
    ball_q = int(m.jnt_qposadr[m.name2id('joint', 'ball/ball_root')])
    ball_d = int(m.jnt_dofadr[m.name2id('joint', 'ball/ball_root')])
    slides = {}
    for p in self.players:
      jx = m.name2id('joint', f'{p.name}/root_x')
      js = m.name2id('joint', f'{p.name}/steer')
      slides[p.name] = (int(m.jnt_qposadr[jx]), int(m.jnt_dofadr[jx]),
                        int(m.jnt_qposadr[js]), int(m.jnt_dofadr[js]))
    self._ball_q, self._ball_d, self._slides = ball_q, ball_d, slides
    length = pitch_size[0]
    self._goal_x = length + _BALL_RADIUS    # |ball_x| past this = goal
    home_sign = jnp.asarray(
        [1.0 if p.team == Team.HOME else -1.0 for p in self.players])

    def pitch_scale(d):
      """Per-episode (sx, sy) wall scale; (1, 1) on a static pitch."""
      mv = d.model_var or {}
      if '_pitch_scale' in mv:
        return jnp.asarray(mv['_pitch_scale'], d.qpos.dtype)
      return jnp.ones(2, d.qpos.dtype)

    def ball_pos(d):
      return d.qpos[ball_q:ball_q + 3]

    def ball_vel(d):
      return d.qvel[ball_d:ball_d + 3]

    def scored(d):
      """+1 home scored (ball in +x goal), -1 away scored, else 0."""
      x = d.qpos[ball_q]
      gx = pitch_scale(d)[0] * length + _BALL_RADIUS
      return ((x > gx).astype(d.qpos.dtype)
              - (x < -gx).astype(d.qpos.dtype))

    self._scored = scored
    self._pitch_scale = pitch_scale

    # --- ball-touch statistics (reference soccer_ball.py:39-150) ---------
    # Static contact slots between each player's geoms and the ball let
    # hit/repossession/interception tracking run entirely in-graph.
    from dm_control_tpu._src import collision as _collision
    ball_geom = m.name2id('geom', 'ball/ball_geom')
    n_players = len(self.players)
    player_slots = []
    for p in self.players:
      slots = []
      for gname in ('shell', 'head', 'arm_l', 'arm_r'):
        try:
          gid = m.name2id('geom', f'{p.name}/{gname}')
        except KeyError:
          continue
        slots.extend(_collision.contact_slots(m, gid, ball_geom).tolist())
      player_slots.append(np.asarray(slots, np.int32))
    self._player_ball_slots = player_slots

    # stats vector layout in model_var['_ball_stats']:
    #   [0:n]   last-hit one-hot over players
    #   [n]     ever_hit, [n+1] hit (this step), [n+2] repossessed,
    #   [n+3]   intercepted, [n+4] time since last hit (control steps)
    _S = n_players

    def _stats_init(dtype):
      return jnp.zeros(n_players + 5, dtype)

    def _ball_stats_hook(m_, d, key, prefix):
      dtype = d.qpos.dtype
      mv = dict(d.model_var or {})
      stats = jnp.asarray(
          mv.get('_ball_stats', _stats_init(dtype)), dtype)
      hits = jnp.stack([
          (d.contact.dist[s] < 0).any() if s.size
          else jnp.zeros((), bool) for s in player_slots])
      hit_any = hits.any()
      onehot = jax.nn.one_hot(jnp.argmax(hits), n_players, dtype=dtype)
      last = stats[:_S]
      had_last = last.sum() > 0
      new_last = jnp.where(hit_any, onehot, last)
      # repossessed: touched by a different player than the previous
      # toucher; intercepted: by the other team (ref soccer_ball.py:117)
      diff_player = (onehot * last).sum() < 0.5
      team_vec = home_sign.astype(dtype)
      diff_team = jnp.abs((onehot * team_vec).sum()
                          - (last * team_vec).sum()) > 0.5
      repossessed = hit_any & had_last & diff_player
      intercepted = hit_any & had_last & diff_team
      mv['_ball_stats'] = jnp.concatenate([
          new_last,
          jnp.stack([
              jnp.maximum(stats[_S], hit_any.astype(dtype)),
              hit_any.astype(dtype),
              repossessed.astype(dtype),
              intercepted.astype(dtype),
              jnp.where(hit_any, 0.0, stats[_S + 4] + 1.0),
          ])])
      return d.replace(model_var=mv)

    ball_entity.after_step_hook = _ball_stats_hook

    def _stats(d):
      mv = d.model_var or {}
      return jnp.asarray(
          mv.get('_ball_stats', _stats_init(d.qpos.dtype)), d.qpos.dtype)

    self.add_observable('ball/hit', ObservableSpec(
        fn=lambda m_, d: _stats(d)[_S + 1]))
    self.add_observable('ball/repossessed', ObservableSpec(
        fn=lambda m_, d: _stats(d)[_S + 2]))
    self.add_observable('ball/intercepted', ObservableSpec(
        fn=lambda m_, d: _stats(d)[_S + 3]))
    self.add_observable('ball/time_since_hit', ObservableSpec(
        fn=lambda m_, d: _stats(d)[_S + 4]))

    # --- per-player observables ------------------------------------------
    goals = jnp.asarray([[length, 0.0, 0.0], [-length, 0.0, 0.0]])

    for p in self.players:
      qx, dx, qs, ds = slides[p.name]
      others = [o for o in self.players if o is not p]
      o_idx = np.asarray([slides[o.name][0] for o in others])
      o_team = jnp.asarray(
          [1.0 if o.team == p.team else -1.0 for o in others])

      def ego(d, vec, qs=qs):
        return _yaw_rot(d.qpos[qs]) @ vec[:2]

      def make(fn):
        return ObservableSpec(fn=fn)

      self.add_observable(f'{p.name}/proprio', make(
          lambda m_, d, qx=qx, dx=dx, qs=qs, ds=ds: jnp.concatenate([
              _yaw_rot(d.qpos[qs]) @ d.qvel[dx:dx + 2],
              d.qvel[dx + 2:dx + 3],
              jnp.stack([jnp.sin(d.qpos[qs]), jnp.cos(d.qpos[qs]),
                         d.qvel[ds]]),
          ])))
      self.add_observable(f'{p.name}/ball_ego', make(
          lambda m_, d, qx=qx, ego=ego: jnp.concatenate([
              ego(d, ball_pos(d) - jnp.concatenate(
                  [d.qpos[qx:qx + 2], jnp.zeros(1, d.qpos.dtype)])),
              ball_pos(d)[2:3],
              ego(d, ball_vel(d)), ball_vel(d)[2:3],
          ])))
      if others:
        self.add_observable(f'{p.name}/others_ego', make(
            lambda m_, d, qx=qx, ego=ego, o_idx=o_idx, o_team=o_team:
            jnp.concatenate([
                jnp.concatenate([
                    ego(d, d.qpos[a:a + 2] - d.qpos[qx:qx + 2]),
                    o_team[i:i + 1].astype(d.qpos.dtype)])
                for i, a in enumerate(o_idx)])))
      self.add_observable(f'{p.name}/goals_ego', make(
          lambda m_, d, qx=qx, ego=ego: jnp.concatenate([
              ego(d, pitch_scale(d)[0] * goals[0, :2] - d.qpos[qx:qx + 2]),
              ego(d, pitch_scale(d)[0] * goals[1, :2]
                  - d.qpos[qx:qx + 2])])))

      # --- per-player game statistics (ref observables.py:31-360) --------
      p_idx = self.players.index(p)
      goal_sign = 1.0 if p.team == Team.HOME else -1.0

      def vel_to_ball(d, qx=qx, dx=dx):
        rel = ball_pos(d)[:2] - d.qpos[qx:qx + 2]
        rel = rel / jnp.maximum(jnp.linalg.norm(rel), 1e-6)
        return jnp.dot(d.qvel[dx:dx + 2], rel)

      self.add_observable(f'{p.name}/stats_vel_to_ball', make(
          lambda m_, d, f=vel_to_ball: f(d)))
      self.add_observable(f'{p.name}/stats_veloc_forward', make(
          lambda m_, d, dx=dx, qs=qs: (
              _yaw_rot(d.qpos[qs]) @ d.qvel[dx:dx + 2])[0]))
      self.add_observable(f'{p.name}/stats_vel_ball_to_goal', make(
          lambda m_, d, gs=goal_sign: gs * ball_vel(d)[0]))
      self.add_observable(f'{p.name}/stats_hit', make(
          lambda m_, d, s=player_slots[p_idx]: (
              (d.contact.dist[s] < 0).any().astype(d.qpos.dtype)
              if s.size else jnp.zeros((), d.qpos.dtype))))
      self.add_observable(f'{p.name}/stats_last_hit', make(
          lambda m_, d, i=p_idx: _stats(d)[i]))
      if len(others) and team_size > 1:
        mates = np.asarray([slides[o.name][0] for o in others
                            if o.team == p.team])
        self.add_observable(f'{p.name}/stats_avg_teammate_dist', make(
            lambda m_, d, qx=qx, mates=mates: jnp.mean(jnp.stack([
                jnp.linalg.norm(d.qpos[a:a + 2] - d.qpos[qx:qx + 2])
                for a in mates]))))

    # --- reward / termination / init -------------------------------------
    def reward(m_, d):
      s = scored(d)
      return home_sign.astype(d.qpos.dtype) * s

    self.set_reward(reward)
    self.set_termination(lambda m_, d: self._scored(d) != 0)

    # pitch geoms whose x/y positions scale with the per-episode pitch
    # size (walls + nets; the ground plane is oversized and stays put).
    # Arena geoms are attached unprefixed.
    pitch_geom_ids = np.asarray(
        [i for n_, i in m.names['geom'].items()
         if '/' not in n_ and n_ != 'ground'], np.int32)
    assert pitch_geom_ids.size >= 12, m.names['geom']

    def init(m_, d, key):
      """Uniform throw-in: players and ball uniformly on the field
      with random headings (reference initializers.py
      UniformInitializer); optional per-episode pitch rescale."""
      dtype = d.qpos.dtype
      n = len(self.players)
      keys = jax.random.split(key, n + 2)
      mv = dict(d.model_var or {})
      if self.randomize_pitch is not None:
        lo_s, hi_s = self.randomize_pitch
        scale = jax.random.uniform(keys[n + 1], (2,), dtype, lo_s, hi_s)
        base = jnp.asarray(m_.geom_pos, dtype)
        scaled = base.at[pitch_geom_ids, 0].mul(scale[0])
        scaled = scaled.at[pitch_geom_ids, 1].mul(scale[1])
        mv['geom_pos'] = scaled
        mv['_pitch_scale'] = scale
        sx, sy = scale[0], scale[1]
      else:
        sx = sy = jnp.ones((), dtype)
      mv['_ball_stats'] = _stats_init(dtype)
      qpos = d.qpos
      for i, p in enumerate(self.players):
        qx, _, qs, _ = slides[p.name]
        xy = jax.random.uniform(
            keys[i], (2,), dtype,
            -jnp.stack([sx * length * 0.8, sy * pitch_size[1] * 0.8]),
            jnp.stack([sx * length * 0.8, sy * pitch_size[1] * 0.8]))
        yaw = jax.random.uniform(keys[i], (), dtype, 0, 2 * np.pi)
        qpos = qpos.at[qx:qx + 2].set(xy).at[qs].set(yaw)
      bxy = jax.random.uniform(
          keys[n], (2,), dtype,
          -jnp.stack([sx * length * 0.5, sy * pitch_size[1] * 0.5]),
          jnp.stack([sx * length * 0.5, sy * pitch_size[1] * 0.5]))
      qpos = qpos.at[ball_q:ball_q + 2].set(bxy)
      qpos = qpos.at[ball_q + 2].set(jnp.asarray(0.5, dtype))
      return d.replace(qpos=qpos, model_var=mv)

    self.add_init_hook(init)

  @property
  def player_action_slices(self):
    return [p.act_slice for p in self.players]


def load(team_size=1, time_limit=45.0, random=None, batch_size=None,
         pitch_size=(12.0, 9.0), goal_size=(3.0, 1.0),
         randomize_pitch=None):
  """team_size-vs-team_size soccer (reference soccer/__init__.py:78).

  Returns a composer Environment whose action is the flat
  (3 * 2 * team_size,) ctrl vector and whose reward is a
  (2 * team_size,) per-player vector.  randomize_pitch=(lo, hi)
  enables the per-episode pitch-size variation (reference
  RandomizedPitch, pitch.py:605)."""
  if not 1 <= team_size <= 11:
    raise ValueError(f'team_size must be in [1, 11], got {team_size}')
  task = Task(team_size=team_size, pitch_size=pitch_size,
              goal_size=goal_size, randomize_pitch=randomize_pitch)
  if batch_size:
    return BatchedEnvironment(task, batch_size, time_limit=time_limit)
  return Environment(task, time_limit=time_limit, random=random)
