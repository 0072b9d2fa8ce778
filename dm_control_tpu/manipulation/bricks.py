"""Duplo-brick manipulation families: stack / reassemble
(reference: manipulation/bricks.py:89-714).

Everything episode-level runs in-graph so the whole family vmaps:

* Desired stack order is sampled with `jax.random.permutation` and
  carried in `Data.model_var['duplo_order']` (the reference shuffles in
  `initialize_episode_mjcf`, bricks.py:253-263).
* The fixed-base brick is not a model edit (the reference removes its
  freejoint, bricks.py:511-528): every brick keeps a freejoint and an
  `after_substep` hook re-pins the base brick's qpos/qvel each substep
  — a weld implemented as a projection, so the same compiled model
  serves both moveable- and fixed-base episodes and every batch lane
  can pin a different brick.
* Goal-hint bricks are contactless static bodies (reference
  bricks.py:536-566 `_hintify`) posed per episode through the
  model_var body_pos/body_quat overlay instead of model surgery.
* The stacking reward is the reference's shaped close/clicked mix over
  corner stud-to-hole distances (bricks.py:415-463), computed from
  `site_xpos` with dynamic gathers over the order array.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.composer.entity import Entity
from dm_control_tpu.composer.observation import ObservableSpec
from dm_control_tpu.entities import duplo
from dm_control_tpu.utils import rewards
from dm_control_tpu.utils import transformations as tr

# reference bricks.py:67-72
_CLOSE_THRESHOLD = 0.01
_CLICK_THRESHOLD = 0.001

# reference shared/workspaces + bricks.py:55-64
_PROP_BBOX_LO = (-0.1, -0.1, 1e-6)
_PROP_BBOX_HI = (0.1, 0.1, 1e-6)
_GOAL_HINT_POS = np.array([0.2, 0.1, 0.0])
_GOAL_HINT_QUAT = np.array([-0.38268343, 0.0, 0.0, 0.92387953])

# reference bricks.py:75-83 color cycle
COLORS = [(1., 0., 0.), (0., 1., 0.), (0., 0., 1.),
          (0., 1., 1.), (1., 0., 1.), (1., 1., 0.)]

_ZROT_PI = np.array([0.0, 0.0, 0.0, 1.0])  # 180 deg about z


def _zrot_quat(theta):
  z = jnp.zeros_like(theta)
  return jnp.stack([jnp.cos(theta / 2), z, z, jnp.sin(theta / 2)], -1)


from dm_control_tpu._src import math as _math

_quat_rotate = _math.quat_rotate


class BrickSet:
  """Index state for n bricks + n goal hints in one compiled model."""

  def __init__(self, task, m, num_bricks):
    self.n = num_bricks
    self.names = [f'brick{i}' for i in range(num_bricks)]
    self.qadr = np.array(
        [int(m.jnt_qposadr[m.name2id('joint', f'{n}/{n}_root')])
         for n in self.names])
    self.dadr = np.array(
        [int(m.jnt_dofadr[m.name2id('joint', f'{n}/{n}_root')])
         for n in self.names])
    self.studs = np.stack(
        [duplo.corner_site_ids(m, n)[0] for n in self.names])  # (n, 2)
    self.holes = np.stack(
        [duplo.corner_site_ids(m, n)[1] for n in self.names])
    self.hint_bids = np.array(
        [m.name2id('body', f'hint{i}/hint{i}') for i in range(num_bricks)])

    for i, name in enumerate(self.names):
      adr = self.qadr[i]
      task.add_observable(f'{name}_pose', ObservableSpec(
          fn=lambda m_, d, a=adr: d.qpos[a:a + 7]))

  # -- reward ---------------------------------------------------------------

  def pair_distance(self, d, bottom, top):
    """Reference `_min_stud_to_hole_distance` (bricks.py:420-430): sum
    of the two corner stud->hole distances, minimized over the brick's
    180-degree symmetry.  bottom/top may be traced indices."""
    sp = d.site_xpos[jnp.asarray(self.studs)[bottom]]   # (2, 3)
    hp = d.site_xpos[jnp.asarray(self.holes)[top]]
    d1 = (jnp.linalg.norm(sp[0] - hp[0]) + jnp.linalg.norm(sp[1] - hp[1]))
    d2 = (jnp.linalg.norm(sp[1] - hp[0]) + jnp.linalg.norm(sp[0] - hp[1]))
    return jnp.minimum(d1, d2)

  def stacking_reward(self, d, order, target_height, close_coef=0.1):
    """Reference `_get_pairwise_stacking_rewards` (bricks.py:432-463)."""
    dists = jnp.stack([
        self.pair_distance(d, order[k], order[k + 1])
        for k in range(target_height - 1)])
    close = rewards.tolerance(dists, (0, _CLOSE_THRESHOLD),
                              margin=10 * _CLOSE_THRESHOLD)
    clicked = rewards.tolerance(dists, (0, _CLICK_THRESHOLD),
                                margin=_CLICK_THRESHOLD)
    return jnp.mean((close_coef * close + clicked) / (close_coef + 1.0))

  # -- episode state --------------------------------------------------------

  def brick_qpos(self, d):
    """(n, 7) gather of every brick's freejoint qpos."""
    return jnp.stack([d.qpos[a:a + 7] for a in self.qadr])

  def set_brick_qpos(self, d, i, pose7):
    """Set brick `i`'s freejoint qpos; i may be traced (one-hot select
    over the static address list)."""
    qpos = d.qpos
    for j, a in enumerate(self.qadr):
      hit = (i == j)
      qpos = qpos.at[a:a + 7].set(
          jnp.where(hit, pose7, qpos[a:a + 7]))
    return d.replace(qpos=qpos)

  def pin_base(self, m, d, base_idx):
    """Record the pin: base brick index one-hot + its current pose."""
    mv = dict(d.model_var or {})
    mv['duplo_pin'] = (jnp.arange(self.n) == base_idx).astype(d.qpos.dtype)
    mv['duplo_pin_qpos'] = self.brick_qpos(d)[base_idx]
    return d.replace(model_var=mv)

  def no_pin(self, m, d):
    mv = dict(d.model_var or {})
    mv['duplo_pin'] = jnp.zeros((self.n,), d.qpos.dtype)
    mv['duplo_pin_qpos'] = jnp.zeros((7,), d.qpos.dtype)
    return d.replace(model_var=mv)

  def pin_project(self, m, d):
    """after_substep projection: snap the pinned brick back to its weld
    pose (the in-graph replacement for freejoint removal)."""
    mv = d.model_var or {}
    if 'duplo_pin' not in mv:
      return d
    pin = mv['duplo_pin']
    pin_qpos = mv['duplo_pin_qpos']
    qpos, qvel = d.qpos, d.qvel
    for i in range(self.n):
      qa, da = self.qadr[i], self.dadr[i]
      w = pin[i] > 0
      qpos = qpos.at[qa:qa + 7].set(
          jnp.where(w, pin_qpos, qpos[qa:qa + 7]))
      qvel = qvel.at[da:da + 6].set(
          jnp.where(w, jnp.zeros(6, qvel.dtype), qvel[da:da + 6]))
    return d.replace(qpos=qpos, qvel=qvel)

  def set_order(self, d, order, length):
    mv = dict(d.model_var or {})
    mv['duplo_order'] = jnp.asarray(order, jnp.int32)[:length]
    return d.replace(model_var=mv)

  # -- stack geometry -------------------------------------------------------

  def stack_poses(self, key, base_pos, base_quat, length):
    """Analytic pose chain for a clicked stack (reference
    `_build_stack`, bricks.py:468-509): each level is rotated 180
    degrees about z with probability 0.5, and positioned so its
    hole_00 (or hole_13 when flipped) lands on the stud_00 of the
    brick below.  Returns (length, 7) poses by rank."""
    dtype = base_pos.dtype
    poses = [jnp.concatenate([base_pos, base_quat])]
    flips = jax.random.bernoulli(key, 0.5, (length,))
    stud_local = jnp.asarray(duplo.STUD_00_LOCAL, dtype)
    hole00 = jnp.asarray(duplo.HOLE_00_LOCAL, dtype)
    hole13 = jnp.asarray(duplo.HOLE_13_LOCAL, dtype)
    zpi = jnp.asarray(_ZROT_PI, dtype)
    for k in range(1, length):
      below = poses[k - 1]
      bpos, bquat = below[:3], below[3:]
      stud_world = bpos + _quat_rotate(bquat, stud_local)
      flip = flips[k]
      quat = jnp.where(flip, tr.quat_mul(bquat, zpi), bquat)
      hole_local = jnp.where(flip, hole13, hole00)
      pos = stud_world - _quat_rotate(quat, hole_local)
      poses.append(jnp.concatenate([pos, quat]))
    return jnp.stack(poses)

  def place_hints(self, m, d, key, order, length):
    """Pose the goal-hint bricks as a stack in the desired order at the
    fixed goal-hint corner (reference bricks.py:280-287)."""
    dtype = d.qpos.dtype
    poses = self.stack_poses(
        key, jnp.asarray(_GOAL_HINT_POS, dtype),
        jnp.asarray(_GOAL_HINT_QUAT, dtype), length)
    mv = dict(d.model_var or {})
    body_pos = jnp.asarray(
        mv.get('body_pos', m.body_pos), dtype)
    body_quat = jnp.asarray(
        mv.get('body_quat', m.body_quat), dtype)
    bids = jnp.asarray(self.hint_bids)
    for k in range(length):
      bid = bids[order[k]]
      body_pos = body_pos.at[bid].set(poses[k, :3])
      body_quat = body_quat.at[bid].set(poses[k, 3:])
    # park unused hints (2-of-3 tasks) out of the scene
    for i in range(self.n):
      used = jnp.zeros((), bool)
      for k in range(length):
        used = jnp.logical_or(used, order[k] == i)
      bid = self.hint_bids[i]
      body_pos = body_pos.at[bid].set(
          jnp.where(used, body_pos[bid],
                    jnp.asarray([0., 0., -1.], dtype)))
    mv['body_pos'] = body_pos
    mv['body_quat'] = body_quat
    return d.replace(model_var=mv)

  def build_stack(self, m, d, key, order, length):
    """Physically assemble bricks[order] into a clicked stack."""
    dtype = d.qpos.dtype
    k1, k2, k3 = jax.random.split(key, 3)
    base_pos = jax.random.uniform(
        k1, (3,), dtype, jnp.asarray(_PROP_BBOX_LO, dtype),
        jnp.asarray(_PROP_BBOX_HI, dtype))
    theta = jax.random.uniform(k2, (), dtype, -jnp.pi, jnp.pi)
    poses = self.stack_poses(k3, base_pos, _zrot_quat(theta), length)
    for k in range(length):
      d = self.set_brick_qpos(d, order[k], poses[k])
    return d


def _make_brick_task(build_fn, num_bricks, vertex_sites=False):
  """Arena + jaco + n bricks + n contactless goal hints + pin hook.

  The pin hook is late-bound: it must close over compiled indices, but
  step hooks ride entities that exist before compilation — so the hook
  reads them through a cell filled right after compile (tracing only
  happens later, when the Environment builds its step function)."""
  bricks = [duplo.duplo_entity(f'brick{i}', color=COLORS[i],
                               vertex_sites=vertex_sites)
            for i in range(num_bricks)]
  hints = [duplo.duplo_entity(f'hint{i}', color=COLORS[i], hint=True)
           for i in range(num_bricks)]
  bs_cell = []

  def pin_hook(m, d, key, prefix):
    return bs_cell[0].pin_project(m, d) if bs_cell else d

  pin_root = ET.Element('mujoco')
  ET.SubElement(pin_root, 'worldbody')
  pin = Entity(mjcf_root=pin_root, name='brickpin',
               after_substep_hook=pin_hook)
  task, m = build_fn(props=tuple(bricks) + tuple(hints) + (pin,))
  from dm_control_tpu.manipulation import tasks as T
  T._Common(task, m)  # arm/tcp observables (brick poses via BrickSet)
  bs = BrickSet(task, m, num_bricks)
  bs_cell.append(bs)
  return task, m, bs


def scatter_bricks(bs, m, d, key, min_sep=0.075, attempts=20):
  """Joint rejection placement of all bricks on the table (the role of
  the reference's PropPlacer, initializers/prop_initializer.py): sample
  `attempts` whole layouts, keep the first whose pairwise brick
  separation exceeds min_sep (clash probability per layout is low, so
  20 attempts effectively always succeed)."""
  dtype = d.qpos.dtype
  n = bs.n
  k1, k2 = jax.random.split(key)
  lo = jnp.asarray(_PROP_BBOX_LO[:2], dtype)
  hi = jnp.asarray(_PROP_BBOX_HI[:2], dtype)
  xy = jax.random.uniform(k1, (attempts, n, 2), dtype, lo, hi)
  pair = jnp.linalg.norm(xy[:, :, None, :] - xy[:, None, :, :], axis=-1)
  pair = pair + jnp.eye(n, dtype=dtype) * 1e3
  ok = (pair.min(axis=(1, 2)) > min_sep) if n > 1 else jnp.ones(
      (attempts,), bool)
  idx = jnp.argmax(ok)
  chosen = xy[idx]
  thetas = jax.random.uniform(k2, (n,), dtype, -jnp.pi, jnp.pi)
  quats = _zrot_quat(thetas)
  qpos = d.qpos
  for i, a in enumerate(bs.qadr):
    pose = jnp.concatenate([
        chosen[i], jnp.asarray([_PROP_BBOX_LO[2]], dtype), quats[i]])
    qpos = qpos.at[a:a + 7].set(pose)
  return d.replace(qpos=qpos)


# ---------------------------------------------------------------------------
# Task factories (registered from tasks.py).


def stack(num_bricks, target_height, moveable_base, randomize_order,
          random=None, batch_size=None):
  """Reference Stack task (bricks.py:186-294)."""
  from dm_control_tpu.manipulation import tasks as T
  task, m, bs = _make_brick_task(T.build_arena_jaco, num_bricks)

  def init(m_, d, key):
    k1, k2, k3 = jax.random.split(key, 3)
    if randomize_order:
      order = jax.random.permutation(k1, num_bricks)
    else:
      order = jnp.arange(num_bricks)
    d = bs.set_order(d, order, target_height)
    d = scatter_bricks(bs, m_, d, k2)
    if moveable_base:
      d = bs.no_pin(m_, d)
    else:
      d = bs.pin_base(m_, d, order[0])
    return bs.place_hints(m_, d, k3, order, target_height)

  task.add_init_hook(init)
  # .get with an arange default: the observation pipeline shapes its
  # buffers from an example Data that has not run the init hook
  def order_of(d):
    return (d.model_var or {}).get('duplo_order',
                                   jnp.arange(target_height))
  if randomize_order:
    task.add_observable('desired_order', ObservableSpec(
        fn=lambda m_, d: order_of(d).astype(d.qpos.dtype)))
  task.set_reward(lambda m_, d: bs.stacking_reward(
      d, order_of(d), target_height))
  return T.make_env(task, batch_size, random)


def reassemble(num_bricks, randomize_initial_order,
               randomize_desired_order, random=None, batch_size=None):
  """Reference Reassemble task (bricks.py:296-414): starts from a
  clicked stack; the goal stack reverses the order above the pinned
  base brick (optionally independently shuffled)."""
  from dm_control_tpu.manipulation import tasks as T
  task, m, bs = _make_brick_task(T.build_arena_jaco, num_bricks)
  n = num_bricks

  def init(m_, d, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if randomize_initial_order:
      initial = jax.random.permutation(k1, n)
    else:
      initial = jnp.arange(n)
    # desired: same base, reversed order above it (bricks.py:358-372)
    desired = jnp.concatenate([initial[:1], initial[-1:0:-1]])
    if randomize_desired_order:
      tail = jax.random.permutation(k2, desired[1:])
      desired = jnp.concatenate([desired[:1], tail])
    d = bs.set_order(d, desired, n)
    d = bs.build_stack(m_, d, k3, initial, n)
    d = bs.pin_base(m_, d, initial[0])
    return bs.place_hints(m_, d, k4, desired, n)

  task.add_init_hook(init)

  def order_of(d):
    return (d.model_var or {}).get('duplo_order', jnp.arange(n))
  if randomize_desired_order or randomize_initial_order:
    task.add_observable('desired_order', ObservableSpec(
        fn=lambda m_, d: order_of(d).astype(d.qpos.dtype)))
  # close_coef=0: the coarse term would penalize breaking up the
  # initial stack (reference bricks.py:404-414)
  task.set_reward(lambda m_, d: bs.stacking_reward(
      d, order_of(d), n, close_coef=0.0))
  return T.make_env(task, batch_size, random)
