"""On-hardware numerics checks: the measurements the tests_tpu battery
asserts over and tools/tpu_check.py records as a per-round artifact.

Three tiers (VERDICT r2 item 3 — TPU numerics need a CI path; the CPU
battery pins JAX_PLATFORMS=cpu so it can never exercise Mosaic):

  * kernel_parity:  Pallas Newton kernel vs the XLA solver core, both
    Mosaic/XLA-compiled on the real chip at float32, per solver-path
    class (pyramidal, elliptic, large-nv, large-nefc).
  * trajectory_drift: N-step open-loop rollout on the TPU at float32 vs
    the same rollout on CPU at float64 (the oracle-parity dtype), per
    domain class, with per-task horizons at the documented chaos floor.
  * kernel_speedup: wall-clock of the batched constraint solve with the
    Pallas kernel vs the pure-XLA core.

Everything returns plain dicts of floats so the artifact is one
json.dumps away.
"""

from __future__ import annotations

import functools
import time
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

# one representative per solver-path class (tests/test_pallas.py MODELS)
KERNEL_MODELS = [
    ('cheetah', 'run'),            # pyramidal contacts, nv=9
    ('finger', 'spin'),            # elliptic cone, iterations=200
    ('manipulator', 'bring_ball'),  # elliptic, nefc=530
    ('humanoid', 'run'),           # nv=27
    ('quadruped', 'walk'),         # nv=22, nefc=306
]

# (domain, task, horizon in control steps): per-class drift rollouts.
# Horizons sit at or below each task's chaos floor — the CPU parity
# battery (tests/test_task_parity.py) measures where f64-vs-f64
# implementation noise itself diverges; f32-vs-f64 drift can only be
# interpreted below that.
DRIFT_TASKS = [
    ('pendulum', 'swingup', 100),   # smooth, no contacts
    ('cartpole', 'swingup', 100),   # RK4 integrator path
    ('cheetah', 'run', 60),         # planar contacts
    ('finger', 'spin', 60),         # elliptic cone
    ('walker', 'walk', 40),         # biped contacts
    ('humanoid', 'run', 20),        # large nv, chaotic
    ('quadruped', 'walk', 20),      # tendons + contacts
    ('fish', 'swim', 60),           # free-body 3D, ball joints
]


def _solve_both(domain, task_name, batch, interpret):
  """(x_ref, f_ref, x_pal, f_pal) for one model: XLA core vs Pallas
  kernel on the default backend."""
  from dm_control_tpu import suite
  from dm_control_tpu._src import efc
  from dm_control_tpu._src import forward as fwd
  from dm_control_tpu._src import solver
  from dm_control_tpu.ops import newton_kernel

  task = suite.build_task(domain, task_name)
  m = task.model
  lay = efc.layout(m)
  keys = jax.random.split(jax.random.PRNGKey(0), batch)

  def init_one(k):
    d = fwd.make_data(m)
    qpos = d.qpos + 0.05 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
    return fwd.forward(m, d.replace(qpos=qpos))

  db = jax.jit(jax.vmap(init_one))(keys)
  niter = max(int(m.opt.iterations), 1)
  tol = solver.effective_tol(float(m.opt.tolerance), db.qpos.dtype)
  mi = float(getattr(m, 'stat_meaninertia', 1.0) or 1.0)

  def xla(d):
    return solver._solve_core_xla(
        d.efc_J, d.qM, d.efc_aref, d.efc_D, d.efc_frictionloss,
        d.efc_active.astype(d.qpos.dtype), d.qacc_smooth, d.qacc_smooth,
        lay=lay, niter=niter, ls_iter=12, tol=tol, meaninertia=mi)

  x_ref, f_ref = jax.jit(jax.vmap(xla))(db)
  x_pal, f_pal = newton_kernel.newton_solve_batched(
      db.efc_J, db.qM, db.efc_aref, db.efc_D, db.efc_frictionloss,
      db.efc_active.astype(db.qpos.dtype), db.qacc_smooth,
      db.qacc_smooth, lay=lay, niter=niter, ls_iter=12, tol=tol,
      meaninertia=mi, interpret=interpret)
  return map(np.asarray, (x_ref, f_ref, x_pal, f_pal))


def kernel_parity_one(domain: str, task_name: str,
                      batch: int = 128) -> dict:
  """Mosaic-compiled kernel vs XLA core, scaled-qacc error stats."""
  x_ref, _, x_pal, _ = _solve_both(domain, task_name, batch,
                                   interpret=False)
  scale = np.maximum(1.0, np.abs(x_ref))
  err = np.abs(x_pal / scale - x_ref / scale)
  return {
      'mean_err': float(err.mean()),
      'max_err': float(err.max()),
      'lanes_over_1e3': int((err.max(axis=1) > 1e-3).sum()),
      'batch': batch,
  }


def kernel_parity(batch: int = 128) -> Dict[str, dict]:
  return {f'{d}-{t}': kernel_parity_one(d, t, batch)
          for d, t in KERNEL_MODELS}


def _rollout(m, task, n_steps, actions, init_qpos=None, init_qvel=None,
             init_act=None):
  """Open-loop n_steps rollout.  When init_qpos/qvel are given, starts
  from that exact state (cast to the action dtype); otherwise runs the
  task's init_episode."""
  from dm_control_tpu._src import forward as fwd

  n_sub = task.n_sub_steps()

  def run(actions):
    d = fwd.make_data(m, dtype=actions.dtype)
    if init_qpos is None:
      d = task.init_episode(m, d, jax.random.PRNGKey(7))
    else:
      d = d.replace(qpos=jnp.asarray(init_qpos, actions.dtype),
                    qvel=jnp.asarray(init_qvel, actions.dtype))
      if init_act is not None and d.act.size:
        d = d.replace(act=jnp.asarray(init_act, actions.dtype))
    d = fwd.forward(m, d)

    def control_step(d, a):
      d = d.replace(ctrl=a)
      def sub(d, _):
        return fwd.step(m, d), None
      d, _ = jax.lax.scan(sub, d, None, length=n_sub)
      return d, (d.qpos, d.qvel)

    d, traj = jax.lax.scan(control_step, d, actions)
    return traj

  return jax.jit(run)(actions)


def trajectory_drift(tasks=None) -> Dict[str, dict]:
  """TPU float32 drift vs the CPU float32 chaos floor.

  Three rollouts from the SAME initial state (task init drawn once at
  float64 on CPU, then cast — jax.random yields different values per
  dtype, so letting each backend re-draw its own init would compare
  different trajectories, not numerics):

    * CPU float64 — the oracle trajectory.
    * CPU float32 — the precision chaos floor: how far ANY correct
      float32 implementation drifts from the oracle over this horizon.
    * TPU float32 — the hardware under test.

  A Mosaic/XLA:TPU numerics bug shows up as tpu_err >> cpu32_err; mere
  f32 chaos shows up as tpu_err ~= cpu32_err (measured round 3: equal
  to 3 significant digits on all 8 tasks).  The artifact bound is
  tpu_err <= max(5e-2, 3 * cpu32_err)."""
  from dm_control_tpu import suite
  from dm_control_tpu._src import forward as fwd

  cpu = jax.devices('cpu')[0]
  out = {}
  for domain, task_name, horizon in (tasks or DRIFT_TASKS):
    task = suite.build_task(domain, task_name)
    m = task.model
    rng = np.random.RandomState(0)
    lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
    hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)
    actions64 = rng.uniform(lo, hi, size=(horizon, m.nu))

    # one float64 init on CPU, shared by all three rollouts
    with jax.enable_x64(True), jax.default_device(cpu):
      d0 = fwd.make_data(m)
      d0 = task.init_episode(m, d0, jax.random.PRNGKey(7))
      init_qpos = np.asarray(d0.qpos)
      init_qvel = np.asarray(d0.qvel)
      init_act = np.asarray(d0.act) if d0.act.size else None

      qpos_cpu, _ = _rollout(m, task, horizon, jnp.asarray(actions64),
                             init_qpos, init_qvel, init_act)
      qpos_cpu = np.asarray(qpos_cpu)

    with jax.default_device(cpu):
      qpos_c32, _ = _rollout(m, task, horizon,
                             jnp.asarray(actions64, jnp.float32),
                             init_qpos, init_qvel, init_act)
      qpos_c32 = np.asarray(qpos_c32)

    qpos_tpu, _ = _rollout(m, task, horizon,
                           jnp.asarray(actions64, jnp.float32),
                           init_qpos, init_qvel, init_act)
    qpos_tpu = np.asarray(qpos_tpu)

    scale = np.maximum(1.0, np.abs(qpos_cpu))
    err_tpu = np.abs(qpos_tpu.astype(np.float64) - qpos_cpu) / scale
    err_c32 = np.abs(qpos_c32.astype(np.float64) - qpos_cpu) / scale
    out[f'{domain}-{task_name}'] = {
        'horizon': horizon,
        'max_scaled_qpos_err': float(err_tpu.max()),
        'final_step_err': float(err_tpu[-1].max()),
        'cpu_f32_floor': float(err_c32.max()),
    }
  return out


def kernel_speedup(batch: int = 1024) -> Dict[str, dict]:
  """Wall-clock of the batched Newton solve: Pallas kernel vs XLA core.

  Measured on REALISTIC mid-episode states (40 random-action control
  steps of rollout first): on perturbed-init states the solve exits in
  1-2 Newton iterations and both implementations time as pure overhead
  (round-5 measured 0.997 'speedup' there vs 1.7x on rolled-out
  states at batch 4096 — the states the production path actually pays
  for)."""
  from dm_control_tpu import suite
  from dm_control_tpu._src import efc
  from dm_control_tpu._src import forward as fwd
  from dm_control_tpu._src import solver
  from dm_control_tpu.ops import newton_kernel

  out = {}
  for domain, task_name in [('cheetah', 'run'), ('humanoid', 'run')]:
    task = suite.build_task(domain, task_name)
    m = task.model
    lay = efc.layout(m)
    ct = getattr(task, 'control_timestep', None)
    n_sub = max(1, round(ct / float(m.opt.timestep))) if ct else 1
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
    hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)

    def init_one(k):
      d = fwd.make_data(m)
      qpos = d.qpos + 0.05 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
      return fwd.forward(m, d.replace(qpos=qpos))

    @jax.jit
    def _rollout(d, key):
      def body(carry, k):
        dd = carry
        u = jax.random.uniform(k, (batch, m.nu), dd.qpos.dtype,
                               jnp.asarray(lo, dd.qpos.dtype),
                               jnp.asarray(hi, dd.qpos.dtype))
        dd = dd.replace(ctrl=u)
        dd = jax.vmap(lambda x: fwd.substeps(m, x, n_sub))(dd)
        return dd, None
      d, _ = jax.lax.scan(body, d, jax.random.split(key, 40))
      return d

    db = _rollout(jax.jit(jax.vmap(init_one))(keys), jax.random.PRNGKey(7))

    @jax.jit
    @jax.vmap
    def _pre_solve(d):
      d = fwd.step1(m, d, skipsensor=True)
      d = fwd.fwd_actuation(m, d)
      return fwd.fwd_acceleration(m, d)

    db = _pre_solve(db)
    jax.block_until_ready(db.qpos)
    niter = max(int(m.opt.iterations), 1)
    tol = solver.effective_tol(float(m.opt.tolerance), db.qpos.dtype)
    mi = float(getattr(m, 'stat_meaninertia', 1.0) or 1.0)
    args = (db.efc_J, db.qM, db.efc_aref, db.efc_D, db.efc_frictionloss,
            db.efc_active.astype(db.qpos.dtype), db.qacc_smooth,
            db.qacc_warmstart)

    def timeit(fn):
      r = fn()  # compile + warm
      jax.block_until_ready(r)
      t0 = time.perf_counter()
      for _ in range(5):
        r = fn()
      jax.block_until_ready(r)
      return (time.perf_counter() - t0) / 5

    kw = dict(lay=lay, niter=niter, ls_iter=12, tol=tol, meaninertia=mi)
    # Both paths must be jitted: calling the kernel wrapper eagerly
    # times per-op dispatch of its host-side tiling, not the kernel
    # (that mistake read as a 1000x slowdown in round 3's first run).
    pal = jax.jit(functools.partial(
        newton_kernel.newton_solve_batched, **kw, interpret=False))
    t_pal = timeit(lambda: pal(*args))
    xla = jax.jit(jax.vmap(lambda *a: solver._solve_core_xla(*a, **kw)))
    t_xla = timeit(lambda: xla(*args))
    out[f'{domain}-{task_name}'] = {
        'pallas_ms': round(t_pal * 1e3, 3),
        'xla_ms': round(t_xla * 1e3, 3),
        'speedup': round(t_xla / t_pal, 3),
        'batch': batch,
        # whether the production dispatch actually uses the monolithic
        # kernel for this model (solver._newton_kernel_wanted)
        'gate_enabled': bool(solver._newton_kernel_wanted(m.nv)),
    }
  return out


def linalg_speedup(batch: int = 4096) -> Dict[str, dict]:
  """Wall-clock of the batched SPD factor+solve tier — the kernel that
  actually buys humanoid's throughput (VERDICT r4 weak #4: the round-4
  artifact measured only the Newton kernel and reported the real ~9x
  lever nowhere).

  Three implementations at each size:
    * pallas:  ops/linalg_kernel.chol_solve_batched (production path
      under the environment vmap on TPU);
    * xla_cc:  jnp.linalg.cholesky + two triangular_solves (XLA's
      batched LAPACK-style custom-call path, what MJX-style code uses);
    * unrolled: the scalar-unrolled jnp fallback (_cholesky_impl), the
      pre-round-4 production path.
  """
  from dm_control_tpu._src import linalg as _linalg
  from dm_control_tpu.ops import linalg_kernel

  out = {}
  for name, n in [('cheetah_nv9', 9), ('quadruped_nv22', 22),
                  ('humanoid_nv27', 27)]:
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (batch, n, n), jnp.float32)
    a = g @ jnp.swapaxes(g, -1, -2) + 2.0 * n * jnp.eye(n, dtype=jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (batch, n),
                          jnp.float32)

    def timeit(fn):
      r = fn()
      jax.block_until_ready(r)
      t0 = time.perf_counter()
      for _ in range(10):
        r = fn()
      jax.block_until_ready(r)
      return (time.perf_counter() - t0) / 10

    pal = jax.jit(linalg_kernel.chol_solve_batched)

    @jax.jit
    def xla_cc(a, b):
      l = jnp.linalg.cholesky(a)
      y = jax.lax.linalg.triangular_solve(
          l, b[..., None], left_side=True, lower=True)
      return jax.lax.linalg.triangular_solve(
          l, y, left_side=True, lower=True, transpose_a=True)[..., 0]

    unrolled = jax.jit(jax.vmap(
        lambda aa, bb: _linalg._cho_solve_impl(_linalg._cholesky_impl(aa),
                                               bb)))

    t_pal = timeit(lambda: pal(a, b))
    t_cc = timeit(lambda: xla_cc(a, b))
    t_un = timeit(lambda: unrolled(a, b))
    out[name] = {
        'pallas_ms': round(t_pal * 1e3, 3),
        'xla_customcall_ms': round(t_cc * 1e3, 3),
        'unrolled_ms': round(t_un * 1e3, 3),
        'speedup_vs_customcall': round(t_cc / t_pal, 3),
        'speedup_vs_unrolled': round(t_un / t_pal, 3),
        'batch': batch,
    }
  return out


def run_all() -> dict:
  backend = jax.default_backend()
  result = {'backend': backend, 'device': str(jax.devices()[0])}
  result['kernel_parity'] = kernel_parity()
  result['trajectory_drift'] = trajectory_drift()
  result['kernel_speedup'] = kernel_speedup()
  result['linalg_speedup'] = linalg_speedup()
  return result
