"""Throughput benchmark: batched env-steps/s on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline configuration (BASELINE.json): cartpole-swingup + cheetah-run,
vmapped random-policy rollouts, float32, batch 4096 each; value is the
aggregate env-steps/s (sum over the two tasks), vs_baseline is the ratio
against the 1M env-steps/s one-host target.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def bench_task(domain, task_name, batch, n_steps, key):
  from dm_control_tpu import suite
  from dm_control_tpu.parallel.runner import BatchedEnv

  task = suite.build_task(domain, task_name)
  env = BatchedEnv(task, batch, auto_reset=True)
  state = env.reset(key)
  run = env.rollout_fn(n_steps)
  # compile + warmup
  state, rewards = run(state, jax.random.fold_in(key, 1))
  jax.block_until_ready(rewards)
  t0 = time.perf_counter()
  state, rewards = run(state, jax.random.fold_in(key, 2))
  jax.block_until_ready(rewards)
  dt = time.perf_counter() - t0
  steps_per_sec = batch * n_steps / dt
  return steps_per_sec


def main():
  batch = int(os.environ.get('BENCH_BATCH', '4096'))
  n_steps = int(os.environ.get('BENCH_STEPS', '200'))
  key = jax.random.PRNGKey(0)
  tasks = [('cartpole', 'swingup'), ('cheetah', 'run')]
  total = 0.0
  detail = {}
  for i, (d, t) in enumerate(tasks):
    sps = bench_task(d, t, batch, n_steps, jax.random.fold_in(key, i))
    detail[f'{d}-{t}'] = round(sps)
    total += sps
  target = 1_000_000.0
  print(json.dumps({
      'metric': 'env_steps_per_sec_aggregate',
      'value': round(total),
      'unit': 'env-steps/s',
      'vs_baseline': round(total / target, 4),
      'detail': detail,
      'batch': batch,
      'device': str(jax.devices()[0]),
  }))


if __name__ == '__main__':
  main()
