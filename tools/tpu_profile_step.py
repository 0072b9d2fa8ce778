"""Real-step timing: scan fwd.step with random ctrl, sweep niter caps.

Usage: python tools/tpu_profile_step.py [domain] [task] [batch] [K] [niters...]
"""
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import dataclasses
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import suite
from dm_control_tpu._src import forward as fwd

domain = sys.argv[1] if len(sys.argv) > 1 else 'humanoid'
task_name = sys.argv[2] if len(sys.argv) > 2 else 'run'
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
K = int(sys.argv[4]) if len(sys.argv) > 4 else 50
niters = [int(x) for x in sys.argv[5:]] or [100, 30, 10]

task = suite.build_task(domain, task_name)
m0 = task.model
keys = jax.random.split(jax.random.PRNGKey(0), B)

for niter in niters:
  m = dataclasses.replace(
      m0, opt=dataclasses.replace(m0.opt, iterations=niter)) if hasattr(
          m0, 'replace') or dataclasses.is_dataclass(m0) else m0
  def init_one(k):
    d = fwd.make_data(m)
    qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
    return fwd.forward(m, d.replace(qpos=qpos))

  db = jax.jit(jax.vmap(init_one))(keys)
  jax.block_until_ready(db.qpos)

  lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
  hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)

  @jax.jit
  def run(d, key):
    def body(carry, _):
      dd, k = carry
      k, sub = jax.random.split(k)
      ctrl = jax.random.uniform(sub, (B, m.nu), minval=jnp.asarray(lo),
                                maxval=jnp.asarray(hi), dtype=jnp.float32)
      dd = dd.replace(ctrl=ctrl)
      dd = jax.vmap(lambda x: fwd.step(m, x))(dd)
      return (dd, k), None
    (d, _), _ = jax.lax.scan(body, (d, key), None, length=K)
    return d

  r = run(db, jax.random.PRNGKey(1))
  jax.block_until_ready(r.qpos)
  t0 = time.perf_counter()
  r = run(db, jax.random.PRNGKey(2))
  jax.block_until_ready(r.qpos)
  dt = (time.perf_counter() - t0) / K * 1e3
  fin = np.isfinite(np.asarray(r.qpos)).all(axis=1)
  print(f'niter={niter:4d}: {dt:7.2f} ms/substep @ {B}  '
        f'({B*K/(time.perf_counter()-t0):,.0f} substeps/s)  '
        f'finite lanes: {fin.sum()}/{B}', flush=True)
