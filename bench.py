"""Throughput benchmark: the BASELINE.md benchmark configs on the
available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

`value` is the BASELINE.json north-star: aggregate env-steps/s over the
16-task Control Suite set on one host.  `detail` carries the individual
configs:
  #2 pendulum+cartpole+reacher @1024
  #3 cheetah-run + walker-walk @4096
  #4 humanoid-run + quadruped-walk @8192
  agg16: per-task steps/s at batch 4096 (sum = value)

Env overrides: BENCH_STEPS (default 200), BENCH_FAST=1 (agg16 only,
batch 1024, 100 steps — for smoke runs).
"""

import json
import os
import sys
import time

import jax

# persistent compile cache: the remote TPU compile helper costs 1-3 min per
# program; caching makes reruns (and the driver's round-end run) fast.
# Fingerprinted by host CPU flags: XLA AOT blobs from a different host are
# loaded with only a warning and can SIGABRT or mis-execute.
import hashlib


def _host_fingerprint() -> str:
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith('flags'):
          return hashlib.sha256(line.encode()).hexdigest()[:12]
  except OSError:
    pass
  return 'unknown'


_cache_dir = f'/root/.cache/jax_bench_{_host_fingerprint()}'
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

# the 16-task aggregate set (benchmarking-tagged Control Suite tasks)
AGG16 = [
    ('pendulum', 'swingup'), ('cartpole', 'swingup'),
    ('cartpole', 'balance'), ('acrobot', 'swingup'),
    ('reacher', 'easy'), ('reacher', 'hard'), ('point_mass', 'easy'),
    ('ball_in_cup', 'catch'), ('hopper', 'hop'), ('cheetah', 'run'),
    ('walker', 'walk'), ('walker', 'run'), ('finger', 'spin'),
    ('fish', 'swim'), ('swimmer', 'swimmer6'), ('humanoid', 'run'),
]


def bench_task(domain, task_name, batch, n_steps, key):
  from dm_control_tpu import suite
  from dm_control_tpu.parallel.runner import BatchedEnv

  task = suite.build_task(domain, task_name)
  env = BatchedEnv(task, batch, auto_reset=True)
  state = env.reset(key)

  # The measurement must be split into chunks so no single device
  # execution runs long: the remote-TPU tunnel kills executions past
  # ~60-100s with UNAVAILABLE "TPU device error" (measured: humanoid@4096
  # x100 steps = 57s passes, x200 = 115s faults deterministically — the
  # round 2/3 "chip fault" in BENCH_r02/r03.json was exactly this).
  probe = env.rollout_fn(8)
  state, rewards = probe(state, jax.random.fold_in(key, 1))  # compile+warm
  jax.block_until_ready(rewards)
  t0 = time.perf_counter()
  state, rewards = probe(state, jax.random.fold_in(key, 2))
  jax.block_until_ready(rewards)
  per_step = (time.perf_counter() - t0) / 8
  chunk = max(1, min(n_steps, int(15.0 / max(per_step, 1e-9))))
  n_chunks = max(1, round(n_steps / chunk))
  print(f'# probe {domain}-{task_name}@{batch}: {per_step * 1e3:.1f} ms/step'
        f' -> chunk={chunk} x{n_chunks}', file=sys.stderr)

  run = env.rollout_fn(chunk)
  state, rewards = run(state, jax.random.fold_in(key, 3))  # compile+warm
  jax.block_until_ready(rewards)
  t0 = time.perf_counter()
  for i in range(n_chunks):
    state, rewards = run(state, jax.random.fold_in(key, 10 + i))
    jax.block_until_ready(rewards)
  dt = time.perf_counter() - t0
  sps = batch * chunk * n_chunks / dt

  # Sanity gates (VERDICT r4 weak #2: BENCH_r04 shipped an impossible
  # 573M steps/s for humanoid pallas-off — an execution that returned
  # without running).  Reject rather than record:
  #  - per-lane ceiling: 1e5 steps/s/lane is ~10x the fastest real
  #    measurement ever seen here (pendulum ~1e4/lane);
  #  - probe cross-check: the final timing may beat the 8-step probe
  #    (longer scans amortize dispatch) but not by 20x.
  probe_sps = batch / max(per_step, 1e-9)
  if sps / batch > 1e5 or sps > 20.0 * probe_sps:
    raise RuntimeError(
        f'implausible measurement {sps:,.0f} steps/s for '
        f'{domain}-{task_name}@{batch} (probe said {probe_sps:,.0f}); '
        f'refusing to record it')
  return sps


def _subprocess_task(spec, batch, n_steps):
  """Measure one task in a FRESH process.  A task can fault with
  UNAVAILABLE purely from accumulated in-process device state (16 tasks'
  executables + buffers in one process — humanoid@4096 runs clean
  standalone but faulted inside the r2/r3 full-bench process); process
  isolation plus the persistent compile cache makes this cheap."""
  import subprocess
  env = dict(os.environ, BENCH_ONLY=spec, BENCH_STEPS=str(n_steps),
             BENCH_BATCH=str(batch))
  out = subprocess.run(
      [sys.executable, os.path.abspath(__file__)], env=env,
      capture_output=True, text=True, timeout=3600, check=True)
  return float(json.loads(out.stdout.strip().splitlines()[-1])[spec])


def _measure_resilient(d, t, batch, n_steps, key, errors):
  """Measure one task, degrading instead of raising.

  Ladder: in-process -> fresh process at full batch -> fresh process at
  halved batches.  Returns (steps_per_sec, batch_used) — (0.0, batch) if
  every rung failed (recorded in `errors`).  The bench MUST always ship a
  JSON line: rounds 2 and 3 exited 1 on a single faulting task and
  recorded no number at all (BENCH_r02/r03.json rc=1)."""
  spec = f'{d}-{t}'
  try:
    return bench_task(d, t, batch, n_steps, key), batch
  except Exception as e:
    print(f'# {spec}@{batch} in-process failed: {type(e).__name__}',
          file=sys.stderr)
    jax.clear_caches()
  for b in (batch, batch // 2, batch // 4):
    if b < 128:
      break
    try:
      return _subprocess_task(spec, b, n_steps), b
    except Exception as e:
      tail = ''
      if hasattr(e, 'stderr') and e.stderr:
        tail = e.stderr.strip().splitlines()[-1][:200]
      print(f'# {spec}@{b} subprocess failed: {type(e).__name__} {tail}',
            file=sys.stderr)
      errors[f'{spec}@{b}'] = f'{type(e).__name__}: {tail}'
  return 0.0, batch


def main():
  n_steps = int(os.environ.get('BENCH_STEPS', '200'))
  fast = os.environ.get('BENCH_FAST') == '1'
  agg_batch = 1024 if fast else 4096
  key = jax.random.PRNGKey(0)
  detail = {}

  only = os.environ.get('BENCH_ONLY')
  if only:  # helper mode (pallas on/off delta + fresh-process fallback)
    batch = int(os.environ.get('BENCH_BATCH', str(agg_batch)))
    out = {}
    for i, spec in enumerate(only.split(',')):
      d, t = spec.split('-', 1)
      try:
        out[spec] = round(bench_task(d, t, batch, n_steps,
                                     jax.random.fold_in(key, 1000 + i)))
      except Exception as e:  # one bad spec must not kill the others
        print(f'# helper {spec}@{batch} failed: {type(e).__name__}: {e}',
              file=sys.stderr)
        out[spec] = None
        jax.clear_caches()
    print(json.dumps(out))
    return

  total = 0.0
  errors = {}
  for i, (d, t) in enumerate(AGG16):
    t0 = time.time()
    sps, b_used = _measure_resilient(d, t, agg_batch, n_steps,
                                     jax.random.fold_in(key, i), errors)
    detail[f'{d}-{t}@{b_used}'] = round(sps)
    total += sps
    print(f'# {d}-{t}@{b_used}: {sps:,.0f} steps/s '
          f'({time.time() - t0:.0f}s incl compile)', file=sys.stderr)
    # drop this task's executables/buffers before the next one: live
    # compile state from many tasks is what faulted humanoid in r2/r3
    jax.clear_caches()

  if not fast:
    # config #2: pendulum + cartpole + reacher @ 1024
    c2 = 0.0
    for j, (d, t) in enumerate([('pendulum', 'swingup'),
                                ('cartpole', 'swingup'),
                                ('reacher', 'easy')]):
      sps2, _ = _measure_resilient(d, t, 1024, n_steps,
                                   jax.random.fold_in(key, 100 + j), errors)
      c2 += sps2
    detail['config2_smooth@1024'] = round(c2)
    jax.clear_caches()
    # config #3: cheetah + walker @ 4096 (from agg16 numbers)
    detail['config3_contact@4096'] = round(
        sum(v for k, v in detail.items()
            if k.startswith(('cheetah-run@', 'walker-walk@'))))
    # config #4: humanoid-run + quadruped-walk @ 8192
    c4 = 0.0
    for j, (d, t) in enumerate([('humanoid', 'run'), ('quadruped', 'walk')]):
      sps4, b4 = _measure_resilient(d, t, 8192, max(n_steps // 2, 50),
                                    jax.random.fold_in(key, 200 + j), errors)
      detail[f'config4_{d}-{t}@{b4}'] = round(sps4)
      c4 += sps4
      jax.clear_caches()
    detail['config4_large@8192'] = round(c4)

    # pallas kernel on/off delta (VERDICT r1 item 9): re-run two contact
    # tasks with the kernel disabled in a fresh process (the dispatch flag
    # is read at trace time, so a subprocess guarantees a clean trace)
    if jax.default_backend() == 'tpu':
      import subprocess
      env = dict(os.environ, DMC_TPU_DISABLE_PALLAS='1',
                 BENCH_ONLY='cheetah-run,humanoid-run',
                 BENCH_STEPS=str(n_steps))
      try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=3600, check=True)
        off = json.loads(out.stdout.strip().splitlines()[-1])
        for k, v in off.items():
          detail[f'{k}@{agg_batch}_pallas_off'] = v
          on = detail.get(f'{k}@{agg_batch}')
          if on and v:
            detail[f'{k}_pallas_speedup'] = round(on / v, 2)
      except Exception as e:
        print(f'# pallas-off delta skipped: {type(e).__name__}: {e}',
              file=sys.stderr)

  target = 1_000_000.0
  out = {
      'metric': 'env_steps_per_sec_16task_aggregate',
      'value': round(total),
      'unit': 'env-steps/s',
      'vs_baseline': round(total / target, 4),
      'detail': detail,
      'batch': agg_batch,
      'n_tasks': len(AGG16),
      'device': str(jax.devices()[0]),
  }
  if errors:
    out['errors'] = errors
  print(json.dumps(out))


if __name__ == '__main__':
  try:
    main()
  except Exception as e:  # last-resort guard: ALWAYS ship a JSON line
    print(json.dumps({
        'metric': 'env_steps_per_sec_16task_aggregate', 'value': 0,
        'unit': 'env-steps/s', 'vs_baseline': 0.0,
        'error': f'{type(e).__name__}: {e}'[:300]}))
    sys.exit(0)
