"""Capture a jax.profiler trace of the humanoid substep on the chip."""
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp

from dm_control_tpu import suite
from dm_control_tpu._src import forward as fwd

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = 10

task = suite.build_task('humanoid', 'run')
m = task.model
keys = jax.random.split(jax.random.PRNGKey(0), B)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  return fwd.forward(m, d.replace(qpos=qpos))


db = jax.jit(jax.vmap(init_one))(keys)
jax.block_until_ready(db.qpos)


@jax.jit
def run(d):
  # the production path: minimal-carry substeps (5 per control step)
  def body(dd, _):
    return jax.vmap(lambda x: fwd.substeps(m, x, 5))(dd), None
  d, _ = jax.lax.scan(body, d, None, length=K)
  return d


out = run(db)
jax.block_until_ready(out.qpos)
with jax.profiler.trace('/tmp/jaxtrace'):
  out = run(db)
  jax.block_until_ready(out.qpos)
print('trace done')
