"""Soft Actor-Critic learner over batched environments (pure jax).

The reference repo ships no learner (SURVEY.md section 5: "No training
checkpoints (no learner in-repo)"); BASELINE.json config #5 requires env
batches feeding a sharded SAC learner, so one is provided here as a
first-class component: twin-Q critics, tanh-squashed Gaussian actor,
learned temperature, device-resident uniform replay ring - everything
inside one jitted train step so it shards over the same mesh as the envs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.parallel.runner import BatchedEnv, RunnerState
from dm_control_tpu.rl.control import TaskDef
from dm_control_tpu._src.types import pytree_dataclass


# ---------------------------------------------------------------------------
# Tiny MLP (no framework dependency; params are plain pytrees).
# ---------------------------------------------------------------------------


def mlp_init(key, sizes, dtype=jnp.float32):
  params = []
  for i in range(len(sizes) - 1):
    key, sub = jax.random.split(key)
    w = jax.random.normal(sub, (sizes[i], sizes[i + 1]), dtype) * jnp.sqrt(
        2.0 / sizes[i])
    params.append({'w': w, 'b': jnp.zeros(sizes[i + 1], dtype)})
  return params


def mlp_apply(params, x, final_act=None):
  for i, layer in enumerate(params):
    x = x @ layer['w'] + layer['b']
    if i < len(params) - 1:
      x = jax.nn.relu(x)
  return final_act(x) if final_act else x


# ---------------------------------------------------------------------------
# Replay ring buffer (device-resident).
# ---------------------------------------------------------------------------


@pytree_dataclass
class Replay:
  obs: jax.Array       # (cap, obs_dim)
  action: jax.Array    # (cap, act_dim)
  reward: jax.Array    # (cap,)
  next_obs: jax.Array  # (cap, obs_dim)
  discount: jax.Array  # (cap,)
  ptr: jax.Array       # () i4
  size: jax.Array      # () i4


def replay_init(capacity, obs_dim, act_dim, dtype=jnp.float32):
  z = lambda *s: jnp.zeros(s, dtype)
  return Replay(obs=z(capacity, obs_dim), action=z(capacity, act_dim),
                reward=z(capacity), next_obs=z(capacity, obs_dim),
                discount=z(capacity),
                ptr=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32))


def replay_add(buf: Replay, obs, action, reward, next_obs, discount):
  """Insert a batch of B transitions at the ring pointer."""
  cap = buf.obs.shape[0]
  b = obs.shape[0]
  idx = (buf.ptr + jnp.arange(b)) % cap
  return buf.replace(
      obs=buf.obs.at[idx].set(obs),
      action=buf.action.at[idx].set(action),
      reward=buf.reward.at[idx].set(reward),
      next_obs=buf.next_obs.at[idx].set(next_obs),
      discount=buf.discount.at[idx].set(discount),
      ptr=(buf.ptr + b) % cap,
      size=jnp.minimum(buf.size + b, cap))


def replay_sample(buf: Replay, key, batch):
  idx = jax.random.randint(key, (batch,), 0, jnp.maximum(buf.size, 1))
  return (buf.obs[idx], buf.action[idx], buf.reward[idx],
          buf.next_obs[idx], buf.discount[idx])


# ---------------------------------------------------------------------------
# SAC.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SACConfig:
  hidden: Tuple[int, ...] = (256, 256)
  gamma: float = 0.99
  tau: float = 0.005
  lr: float = 3e-4
  init_temperature: float = 0.1
  replay_capacity: int = 1 << 17
  learn_batch: int = 256
  seed: int = 0


@pytree_dataclass
class SACState:
  actor: Any
  q1: Any
  q2: Any
  q1_target: Any
  q2_target: Any
  log_alpha: jax.Array
  opt_m: Any   # first moments (adam) for (actor, q1, q2, log_alpha)
  opt_v: Any   # second moments
  step: jax.Array


class SAC:
  """SAC learner bound to a TaskDef's observation/action shapes."""

  def __init__(self, task: TaskDef, config: SACConfig = SACConfig()):
    self.task = task
    self.config = config
    # infer obs dim from the task's observation at qpos0
    from dm_control_tpu._src import forward as _fwd
    d = _fwd.make_data(task.model)
    d = _fwd.forward(task.model, d)
    obs = task.get_observation(task.model, d)
    self.obs_dim = int(sum(np.prod(np.shape(v)) or 1 for v in obs.values()))
    self.act_dim = task.model.nu
    self.target_entropy = -float(self.act_dim)

  def obs_vector(self, obs_dict) -> jax.Array:
    """Flatten an observation dict (batched or not) into a vector."""
    leaves = [jnp.atleast_1d(v) for v in obs_dict.values()]
    if leaves[0].ndim > 1 or (leaves[0].ndim == 1 and any(
        v.ndim > 1 for v in leaves)):
      return jnp.concatenate(
          [v.reshape(v.shape[0], -1) for v in obs_dict.values()], axis=-1)
    return jnp.concatenate([v.reshape(-1) for v in leaves])

  def init(self, key=None) -> SACState:
    key = key if key is not None else jax.random.PRNGKey(self.config.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    h = list(self.config.hidden)
    actor = mlp_init(k1, [self.obs_dim] + h + [2 * self.act_dim])
    q1 = mlp_init(k2, [self.obs_dim + self.act_dim] + h + [1])
    q2 = mlp_init(k3, [self.obs_dim + self.act_dim] + h + [1])
    params = (actor, q1, q2, jnp.log(self.config.init_temperature))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return SACState(
        actor=actor, q1=q1, q2=q2,
        q1_target=jax.tree_util.tree_map(jnp.array, q1),
        q2_target=jax.tree_util.tree_map(jnp.array, q2),
        log_alpha=jnp.log(self.config.init_temperature),
        opt_m=zeros, opt_v=zeros, step=jnp.zeros((), jnp.int32))

  # -- policy --------------------------------------------------------------

  def _dist(self, actor, obs):
    out = mlp_apply(actor, obs)
    mu, log_std = jnp.split(out, 2, axis=-1)
    log_std = jnp.clip(log_std, -10.0, 2.0)
    return mu, log_std

  def act(self, state: SACState, obs_vec, key, deterministic=False):
    mu, log_std = self._dist(state.actor, obs_vec)
    if deterministic:
      return jnp.tanh(mu)
    eps = jax.random.normal(key, mu.shape)
    return jnp.tanh(mu + jnp.exp(log_std) * eps)

  def _sample_with_logp(self, actor, obs, key):
    mu, log_std = self._dist(actor, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    act = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * (eps ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
        - jnp.log(jnp.maximum(1 - act ** 2, 1e-6)), axis=-1)
    return act, logp

  # -- one learner update --------------------------------------------------

  def update(self, state: SACState, batch, key) -> Tuple[SACState, Dict]:
    obs, action, reward, next_obs, discount = batch
    cfg = self.config
    k1, k2 = jax.random.split(key)

    def q_apply(q, o, a):
      return mlp_apply(q, jnp.concatenate([o, a], -1))[..., 0]

    next_a, next_logp = self._sample_with_logp(state.actor, next_obs, k1)
    alpha = jnp.exp(state.log_alpha)
    target_q = jnp.minimum(q_apply(state.q1_target, next_obs, next_a),
                           q_apply(state.q2_target, next_obs, next_a))
    target = reward + cfg.gamma * discount * (target_q - alpha * next_logp)
    target = jax.lax.stop_gradient(target)

    def losses(params):
      actor, q1, q2, log_alpha = params
      q1_pred = q_apply(q1, obs, action)
      q2_pred = q_apply(q2, obs, action)
      critic_loss = (jnp.mean((q1_pred - target) ** 2)
                     + jnp.mean((q2_pred - target) ** 2))
      a_new, logp = self._sample_with_logp(actor, obs, k2)
      q_new = jnp.minimum(
          q_apply(jax.lax.stop_gradient(q1), obs, a_new),
          q_apply(jax.lax.stop_gradient(q2), obs, a_new))
      actor_loss = jnp.mean(
          jnp.exp(jax.lax.stop_gradient(log_alpha))
          * logp - q_new)
      alpha_loss = -jnp.mean(
          log_alpha * jax.lax.stop_gradient(logp + self.target_entropy))
      return critic_loss + actor_loss + alpha_loss, dict(
          critic_loss=critic_loss, actor_loss=actor_loss,
          alpha_loss=alpha_loss, alpha=jnp.exp(log_alpha))

    params = (state.actor, state.q1, state.q2, state.log_alpha)
    (loss, metrics), grads = jax.value_and_grad(
        losses, has_aux=True)(params)

    # adam
    step = state.step + 1
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = jax.tree_util.tree_map(
        lambda mm, g: b1 * mm + (1 - b1) * g, state.opt_m, grads)
    v = jax.tree_util.tree_map(
        lambda vv, g: b2 * vv + (1 - b2) * g * g, state.opt_v, grads)
    t = step.astype(jnp.float32)
    lr = cfg.lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
    new_params = jax.tree_util.tree_map(
        lambda p, mm, vv: p - lr * mm / (jnp.sqrt(vv) + eps),
        params, m, v)
    actor, q1, q2, log_alpha = new_params

    q1_t = jax.tree_util.tree_map(
        lambda tp, p: (1 - cfg.tau) * tp + cfg.tau * p, state.q1_target, q1)
    q2_t = jax.tree_util.tree_map(
        lambda tp, p: (1 - cfg.tau) * tp + cfg.tau * p, state.q2_target, q2)

    return SACState(actor=actor, q1=q1, q2=q2, q1_target=q1_t,
                    q2_target=q2_t, log_alpha=log_alpha,
                    opt_m=m, opt_v=v, step=step), metrics


def make_train_step(sac: SAC, env: BatchedEnv):
  """One fused actor+learner step over the batched env (jittable).

  carry = (sac_state, runner_state, replay, key); each call:
  act -> env.step -> replay_add -> sample -> sac.update.
  """
  task = sac.task

  def train_step(carry, _=None):
    sac_state, run_state, replay, key = carry
    key, k_act, k_sample, k_update = jax.random.split(key, 4)

    obs_dict = jax.vmap(
        lambda d: task.get_observation(task.model, d))(run_state.data)
    obs_vec = sac.obs_vector(obs_dict)
    actions = sac.act(sac_state, obs_vec, k_act)
    lo = jnp.asarray(np.where(task.model.actuator_ctrllimited,
                              task.model.actuator_ctrlrange[:, 0], -1.0),
                     actions.dtype)
    hi = jnp.asarray(np.where(task.model.actuator_ctrllimited,
                              task.model.actuator_ctrlrange[:, 1], 1.0),
                     actions.dtype)
    scaled = lo + (actions + 1.0) * 0.5 * (hi - lo)

    run_state, (next_obs_dict, reward, done, discount) = env.step(
        run_state, scaled)
    next_obs_vec = sac.obs_vector(next_obs_dict)
    replay = replay_add(replay, obs_vec, actions,
                        reward.astype(obs_vec.dtype),
                        next_obs_vec, discount.astype(obs_vec.dtype))
    batch = replay_sample(replay, k_sample, sac.config.learn_batch)
    sac_state, metrics = sac.update(sac_state, batch, k_update)
    metrics['reward_mean'] = jnp.mean(reward)
    return (sac_state, run_state, replay, key), metrics

  return train_step
