"""Record the on-chip numerics artifact: TPUCHECK_r{N}.json.

Runs the tests_tpu measurements (kernel parity, trajectory drift,
kernel speedup) directly on the real chip and writes one JSON artifact
so every round carries hardware-verified numerics evidence (VERDICT r2
item 3).  Usage:

    python tools/tpu_check.py [round_number]

Exit status is non-zero if any check violates the tests_tpu bounds.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
  rnd = sys.argv[1] if len(sys.argv) > 1 else '03'
  out_path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), f'TPUCHECK_r{rnd}.json')

  if jax.default_backend() != 'tpu':
    result = {'ok': False, 'skipped': True,
              'reason': f'backend is {jax.default_backend()}, not tpu'}
    print(json.dumps(result))
    with open(out_path, 'w') as f:
      json.dump(result, f, indent=1)
    return 0

  from dm_control_tpu.testing import tpu_checks

  result = tpu_checks.run_all()
  failures = []
  for name, r in result['kernel_parity'].items():
    # kernel vs XLA core, both float32: on ill-conditioned lanes the two
    # correct-in-exact-arithmetic factorizations legitimately spread to
    # a few e-2 (measured: humanoid 3.3e-2 on 4/128 lanes after the
    # unrolled-Cholesky change, while f64-ground-truth trajectory drift
    # IMPROVED 14x to 1.6e-5 — the drift gate below is the correctness
    # gate; this one guards against gross lowering bugs like r2's 2.9e+2)
    if not (r['mean_err'] <= 1e-4 and r['max_err'] <= 5e-2
            and r['lanes_over_1e3'] <= r['batch'] // 10):
      failures.append(f'kernel_parity:{name}')
  for name, r in result['trajectory_drift'].items():
    # calibrated to the CPU float32 chaos floor: a hardware numerics
    # bug shows as drift far above what f32 precision itself causes
    if not r['max_scaled_qpos_err'] <= max(5e-2, 3 * r['cpu_f32_floor']):
      failures.append(f'trajectory_drift:{name}')
  for name, r in result['kernel_speedup'].items():
    if not r['speedup'] >= 0.9:
      failures.append(f'kernel_speedup:{name}')
  result['ok'] = not failures
  result['failures'] = failures

  with open(out_path, 'w') as f:
    json.dump(result, f, indent=1)
  print(json.dumps(result))
  return 0 if result['ok'] else 1


if __name__ == '__main__':
  sys.exit(main())
