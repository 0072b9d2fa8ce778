"""Discrete LQR solution for the lqr domain - the analytic policy oracle.

Replaces the reference's Riccati solver (dm_control/suite/lqr_solver.py:31,
which linearizes via native MuJoCo calls + scipy): here the dynamics
Jacobians A = dx'/dx, B = dx'/du come from jax.jacobian of the engine's
own step function (analytic differentiation through the physics), and the
discrete algebraic Riccati equation is solved by fixed-point iteration.
Used by tests as a ground-truth correctness oracle (the optimal policy
must achieve near-optimal return, mirroring suite/lqr_test.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import forward as _forward
from dm_control_tpu.rl.control import TaskDef


def linearize(task: TaskDef):
  """(A, B) of the step map around the origin, state = [qpos; qvel]."""
  m = task.model
  nq, nv, nu = m.nq, m.nv, m.nu

  def step_map(state, u):
    d = _forward.make_data(m)
    d = d.replace(qpos=state[:nq], qvel=state[nq:], ctrl=u)
    d = _forward.forward(m, d)  # establish the step1-synced invariant
    for _ in range(task.n_sub_steps()):
      d = _forward.step(m, d)
    return jnp.concatenate([d.qpos, d.qvel])

  x0 = jnp.zeros(nq + nv)
  u0 = jnp.zeros(nu)
  a = jax.jacobian(step_map, argnums=0)(x0, u0)
  b = jax.jacobian(step_map, argnums=1)(x0, u0)
  return np.asarray(a), np.asarray(b)


def solve(task: TaskDef, control_cost_coef: float = 0.1,
          iterations: int = 2000):
  """Optimal feedback gain K: u = -K [qpos; qvel]."""
  a, b = linearize(task)
  n = a.shape[0]
  nq = task.model.nq
  q = np.zeros((n, n))
  q[:nq, :nq] = np.eye(nq)  # reward penalizes position only
  r = control_cost_coef * np.eye(b.shape[1])

  p = q.copy()
  for _ in range(iterations):
    btp = b.T @ p
    k = np.linalg.solve(r + btp @ b, btp @ a)
    p_new = q + a.T @ p @ (a - b @ k)
    if np.abs(p_new - p).max() < 1e-12:
      p = p_new
      break
    p = p_new
  btp = b.T @ p
  k = np.linalg.solve(r + btp @ b, btp @ a)
  return k
