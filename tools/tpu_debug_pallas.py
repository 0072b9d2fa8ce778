"""Standalone on-chip repro of tests/test_pallas.py::_solve_both.

Usage: python tools/tpu_debug_pallas.py [domain] [task] [batch]
Prints the scaled qacc error (kernel vs XLA core) on the real TPU.
"""
import os
import sys

os.makedirs('/root/.cache/jax_tpudbg', exist_ok=True)
import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_tpudbg')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')

import numpy as np
from test_pallas import _solve_both


def main():
  domain = sys.argv[1] if len(sys.argv) > 1 else 'quadruped'
  task = sys.argv[2] if len(sys.argv) > 2 else 'walk'
  batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
  print(f'device={jax.devices()[0]} model={domain}-{task} batch={batch}',
        flush=True)
  x_ref, f_ref, x_pal, f_pal = _solve_both(domain, task, batch,
                                           interpret=False)
  scale = np.maximum(1.0, np.abs(x_ref))
  err = np.abs(x_pal / scale - x_ref / scale)
  print(f'scaled qacc err: max={err.max():.3e} mean={err.mean():.3e}')
  bad = np.unique(np.where(err > 1e-3)[0])
  print(f'lanes over 1e-3: {len(bad)}/{batch}; worst lane {err.max(axis=1).argmax()}')
  fscale = np.maximum(1.0, np.abs(f_ref))
  ferr = np.abs(f_pal / fscale - f_ref / fscale)
  print(f'scaled force err: max={ferr.max():.3e} mean={ferr.mean():.3e}')


if __name__ == '__main__':
  main()
