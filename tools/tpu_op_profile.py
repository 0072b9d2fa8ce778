"""Op-level TPU profile of the production substep: top ops by self time.

Captures a jax.profiler trace of the humanoid substeps scan and
aggregates XLA op self-times from the xplane proto
(tensorboard_plugin_profile is in the image).

Usage: python tools/tpu_op_profile.py [domain] [task] [batch] [top_n]
"""
import collections
import glob
import os
import sys

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp
import numpy as np

from dm_control_tpu import suite
from dm_control_tpu._src import forward as fwd

domain = sys.argv[1] if len(sys.argv) > 1 else 'humanoid'
task_name = sys.argv[2] if len(sys.argv) > 2 else 'run'
B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
TOP = int(sys.argv[4]) if len(sys.argv) > 4 else 40

task = suite.build_task(domain, task_name)
m = task.model
n_sub = max(1, round(task.control_timestep / float(m.opt.timestep)))
keys = jax.random.split(jax.random.PRNGKey(0), B)
lo = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 0], -1.0)
hi = np.where(m.actuator_ctrllimited, m.actuator_ctrlrange[:, 1], 1.0)


def init_one(k):
  d = fwd.make_data(m)
  qpos = d.qpos + 0.01 * jax.random.normal(k, (m.nq,), d.qpos.dtype)
  return fwd.forward(m, d.replace(qpos=qpos))


import functools


@functools.partial(jax.jit, static_argnums=2)
def roll(d, key, n):
  def body(carry, k):
    dd = carry
    u = jax.random.uniform(k, (B, m.nu), dd.qpos.dtype,
                           jnp.asarray(lo, dd.qpos.dtype),
                           jnp.asarray(hi, dd.qpos.dtype))
    dd = dd.replace(ctrl=u)
    dd = jax.vmap(lambda x: fwd.substeps(m, x, n_sub))(dd)
    return dd, None
  d, _ = jax.lax.scan(body, d, jax.random.split(key, n))
  return d


db = jax.jit(jax.vmap(init_one))(keys)
db = roll(db, jax.random.PRNGKey(7), 40)
jax.block_until_ready(db.qpos)

logdir = '/tmp/optrace'
os.system(f'rm -rf {logdir}')
with jax.profiler.trace(logdir):
  out = roll(db, jax.random.PRNGKey(9), 10)
  jax.block_until_ready(out.qpos)

files = glob.glob(f'{logdir}/**/*.xplane.pb', recursive=True)
print('xplane files:', files)
from tensorflow.tsl.profiler.protobuf import xplane_pb2

agg = collections.Counter()
cat = collections.Counter()
total = 0
for fp in files:
  xs = xplane_pb2.XSpace()
  with open(fp, 'rb') as f:
    xs.ParseFromString(f.read())
  for plane in xs.planes:
    if 'TPU' not in plane.name and 'device' not in plane.name.lower():
      continue
    stats_meta = {s.id: s.name for s in plane.stat_metadata.values()}
    ev_meta = {e.id: e.name for e in plane.event_metadata.values()}
    for line in plane.lines:
      if 'XLA Ops' not in line.name and 'Ops' not in line.name:
        continue
      for ev in line.events:
        name = ev_meta.get(ev.metadata_id, '?')
        dur = ev.duration_ps / 1e9  # ms
        agg[name] += dur
        total += dur
        # categorize by op kind prefix
        kind = name.split('.')[0].split('َ')[0]
        kind = ''.join(c for c in kind if not c.isdigit())
        cat[kind] += dur

print(f'\ntotal device op time: {total:.1f} ms over 10 control steps '
      f'({n_sub * 10} substeps)')
print(f'\n== top {TOP} ops ==')
for name, t in agg.most_common(TOP):
  print(f'{t:9.3f} ms  {name[:110]}')
print('\n== by op kind ==')
for name, t in cat.most_common(30):
  print(f'{t:9.3f} ms  {name}')
