"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Tests run on the CPU backend (fast compiles, float64 available for
bit-parity against the reference oracle); the TPU path is exercised by
bench.py and __graft_entry__.py.
"""

import os

# Force CPU: the session environment may preset JAX_PLATFORMS to the remote
# TPU tunnel, which would silently run float64 parity tests in float32 over
# RPC.  Tests must be local CPU; the TPU path is bench.py / __graft_entry__.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU plugin and can
# override JAX_PLATFORMS; pin the platform programmatically as well.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
# persistent executable cache: identical HLO (e.g. the second env build
# in determinism tests, or battery re-runs) skips the XLA:CPU compile.
# The cache dir is fingerprinted by host CPU flags: XLA:CPU AOT blobs are
# machine-specific, but the loader only WARNS on a feature mismatch and
# then executes them anyway - a cache written on a previous session's
# host (different avx512/prefer-no-scatter set) caused SIGABRT worker
# crashes and silently wrong numerics in the battery.
import hashlib  # noqa: E402


def _host_fingerprint() -> str:
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith('flags'):
          return hashlib.sha256(line.encode()).hexdigest()[:12]
  except OSError:
    pass
  return 'unknown'


jax.config.update('jax_compilation_cache_dir',
                  f'/root/.cache/jax_tests_{_host_fingerprint()}')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

SUITE_DIR = '/root/reference/dm_control/suite'


def _rss_gb() -> float:
  try:
    with open('/proc/self/statm') as f:
      pages = int(f.read().split()[1])
    return pages * 4096 / 1e9
  except Exception:
    return 0.0


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_jax_compile_cache():
  """XLA:CPU can fault after accumulating very many large float64
  executables in one process; clearing jax caches when RSS grows keeps
  per-process compile state bounded (tests are also spread across xdist
  workers per-file for the same reason)."""
  yield
  # 6 workers x 20 GB was brushing against the 125 GB box under the full
  # battery; keep total jit-state well below the memory ceiling
  if _rss_gb() > 8.0:
    jax.clear_caches()
