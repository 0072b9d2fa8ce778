"""Time the pieces of BatchedEnv._step for humanoid@B on the chip.

Each variant runs K steps inside ONE lax.scan (one device execution), so
remote-dispatch overhead (~hundreds of ms/call through the tunnel) does
not pollute the numbers.

Usage: python tools/tpu_profile_envstep.py [batch] [K]
"""
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')

import jax.numpy as jnp

from dm_control_tpu import suite
from dm_control_tpu._src import forward as fwd
from dm_control_tpu.parallel.runner import BatchedEnv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20

task = suite.build_task('humanoid', 'run')
m = task.model
env = BatchedEnv(task, B, auto_reset=True)
key = jax.random.PRNGKey(0)
state = env.reset(key)
jax.block_until_ready(state.data.qpos)
acts = jnp.zeros((B, m.nu), jnp.float32)


def _sub(d):
  def body(dd, _):
    return fwd.step(m, dd), None
  d, _ = jax.lax.scan(body, d, None, length=env.n_sub_steps)
  return d


def scan_variant(step1):
  """(carry -> carry) K times in one scan; carry is RunnerState."""
  @jax.jit
  def run(s):
    def body(c, _):
      return step1(c), None
    s, _ = jax.lax.scan(body, s, None, length=K)
    return s
  return run


def v_substeps(s):
  d = jax.vmap(_sub)(s.data.replace(ctrl=jnp.broadcast_to(
      acts[:, :], acts.shape)))
  return s.replace(data=d)


def v_reward(s):
  d = jax.vmap(_sub)(s.data.replace(ctrl=acts))
  r = jax.vmap(lambda x: task.get_reward(m, x))(d)
  return s.replace(data=d, step_count=s.step_count + r.astype(jnp.int32) * 0)


def v_obs(s):
  d = jax.vmap(_sub)(s.data.replace(ctrl=acts))
  o = jax.vmap(lambda x: task.get_observation(m, x))(d)
  extra = sum(jnp.sum(v).astype(jnp.int32) * 0 for v in o.values())
  return s.replace(data=d, step_count=s.step_count + extra)


def v_full(s):
  return env._step_fn(s, acts)[0]


for name, v in [('substeps', v_substeps), ('sub+reward', v_reward),
                ('sub+obs', v_obs), ('full env.step', v_full)]:
  run = scan_variant(v)
  out = run(state)
  jax.block_until_ready(out.data.qpos)
  t0 = time.perf_counter()
  out = run(state)
  jax.block_until_ready(out.data.qpos)
  dt = (time.perf_counter() - t0) / K
  print(f'{name:16s} {dt * 1e3:8.1f} ms/step '
        f'({B / dt:,.0f} steps/s)', flush=True)
