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
# the quadruped-escape oracle re-uploads its heightfield through a GL
# context on episode init; EGL works headless on this box (GLFW/OSMesa
# do not)
os.environ.setdefault('MUJOCO_GL', 'egl')

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


# Per-WORKER cache dirs: the round-4 battery failed ~2% of rows
# nondeterministically under `-n 6` (wrong-numerics assertion failures
# that all pass serially).  Root cause: jax's LRUCache.put writes cache
# blobs via a bare `cache_path.write_bytes(val)` — NOT atomic, and the
# inter-process lock is only taken when eviction is enabled (verified
# in jax 0.9.0 `jax/_src/lru_cache.py`).  Six workers sharing one dir
# race writer-vs-reader on the same key; a torn blob deserializes into
# either a SIGABRT (the observed worker crashes) or a silently-wrong
# executable (the observed wrong-numerics rows, all passing serially).
# Isolating each worker's cache removes every cross-process race while
# keeping within-worker reuse (the big win: determinism tests recompile
# identical HLO in the same process).  Subprocess-isolated tests get
# their own per-parent-worker subdir via DMC_TPU_CACHE_SUBDIR so inner
# runs never share a dir with a live worker either.
_worker = os.environ.get(
    'DMC_TPU_CACHE_SUBDIR',
    os.environ.get('PYTEST_XDIST_WORKER', 'gw0'))
# The cache root is ALSO keyed by the checkout path: two test sessions
# from different checkouts (e.g. a snapshot battery + dev-tree test
# runs) otherwise share per-worker dirs by worker ID and re-create the
# torn-blob race this scheme exists to prevent.  Two concurrent
# sessions from the SAME checkout still must not overlap.
_tree = hashlib.sha256(
    os.path.dirname(os.path.abspath(__file__)).encode()).hexdigest()[:8]
jax.config.update(
    'jax_compilation_cache_dir',
    f'/root/.cache/jax_tests_{_host_fingerprint()}_{_tree}/{_worker}')
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
  # battery; keep total jit-state well below the memory ceiling.
  # Threshold lowered 8 -> 4 GB round 5: the residual battery failure
  # mode is XLA:CPU SIGABRTing a long-lived worker that has accumulated
  # many large f64 executables (observed ~once per full run, random row,
  # always passes in a fresh process); clearing earlier keeps workers
  # further from that state at the cost of some recompilation.
  if _rss_gb() > 4.0:
    jax.clear_caches()


# ---------------------------------------------------------------------------
# Subprocess isolation for the heavy rows (VERDICT r2 item 4).
#
# The biggest float64 compiles (dog x5 parity rows, humanoid/CMU,
# swimmer15, finger parity) intermittently SIGABRT their xdist worker
# when they run in a process that has already accumulated many large
# XLA:CPU executables — every one passes in a fresh process.  Running
# each of them in its own python turns a silent worker death into a
# loud, attributable test failure and removes the top RSS contributors
# from the shared workers.  (pytest-forked is not in this image, and
# fork() under live XLA threads is unsafe anyway — so: subprocess.)

_SUBPROC_FILES = ('test_task_parity.py', 'test_suite_determinism.py')
_SUBPROC_PATTERNS = ('dog', 'humanoid', 'CMU', 'swimmer15', 'finger')
_SUBPROC_INNER_ENV = 'DMC_TPU_SUBPROC_INNER'


def pytest_configure(config):
  config.addinivalue_line(
      'markers', 'subprocess_isolated: run this test in a fresh python')


def pytest_collection_modifyitems(config, items):
  if os.environ.get(_SUBPROC_INNER_ENV):
    return
  for item in items:
    nid = item.nodeid
    if (any(f in nid for f in _SUBPROC_FILES)
        and any(p in nid for p in _SUBPROC_PATTERNS)):
      item.add_marker(pytest.mark.subprocess_isolated)


def pytest_runtest_protocol(item, nextitem):
  if (item.get_closest_marker('subprocess_isolated') is None
      or os.environ.get(_SUBPROC_INNER_ENV)):
    return None
  import subprocess
  import sys
  import time as _time
  from _pytest.reports import TestReport

  ihook = item.ihook
  ihook.pytest_runtest_logstart(nodeid=item.nodeid, location=item.location)
  # the previous (normal) item's fixture finalizers are pending: the
  # standard runner pops them during THIS item's setup, which we bypass.
  # Without this, the next normal test's setup dies with "previous item
  # was not torn down properly".
  try:
    item.session._setupstate.teardown_exact(nextitem)
  except Exception:
    pass
  t0 = _time.time()
  env = dict(os.environ, **{_SUBPROC_INNER_ENV: '1'})
  # inner runs keep a compile cache keyed to their parent worker: stable
  # (warm across re-runs) and never shared with a concurrently-live
  # worker process
  env['DMC_TPU_CACHE_SUBDIR'] = (
      'sub_' + os.environ.get('PYTEST_XDIST_WORKER', 'serial'))
  env.pop('PYTEST_XDIST_WORKER', None)
  proc = subprocess.run(
      # -n 0 neutralizes the ini's "-n 6" (xdist must stay importable
      # because addopts reference it); the inner run is single-process
      [sys.executable, '-m', 'pytest', item.nodeid, '-x', '-q',
       '-n', '0', '-p', 'no:cacheprovider'],
      capture_output=True, text=True, env=env,
      cwd=str(item.config.rootpath), timeout=3600)
  duration = _time.time() - t0
  passed = proc.returncode == 0
  longrepr = None
  if not passed:
    tail = (proc.stdout or '')[-6000:] + '\n' + (proc.stderr or '')[-2000:]
    longrepr = (f'subprocess-isolated test failed '
                f'(exit code {proc.returncode}):\n{tail}')
  # xdist's controller asserts on the full setup/call/teardown report
  # sequence per item — emit all three
  for when, outcome, lr, dur in (
      ('setup', 'passed', None, 0.0),
      ('call', 'passed' if passed else 'failed', longrepr, duration),
      ('teardown', 'passed', None, 0.0)):
    report = TestReport(
        nodeid=item.nodeid, location=item.location,
        # name->1 form: marker OBJECTS as values break execnet
        # serialization and kill the xdist worker
        keywords={k: 1 for k in item.keywords},
        outcome=outcome, longrepr=lr, when=when, duration=dur)
    ihook.pytest_runtest_logreport(report=report)
  ihook.pytest_runtest_logfinish(nodeid=item.nodeid, location=item.location)
  return True


# ---------------------------------------------------------------------------
# Thread-leak attribution (the 'truth value of an array is ambiguous'
# plague): a python thread that outlives its test keeps running jax/numpy
# concurrently with later tests in this worker and corrupts numpy
# errstate process-wide.  Fail the LEAKING test by name instead of
# letting innocent tests downstream absorb the fallout.
# ---------------------------------------------------------------------------

_THREAD_BASELINE = None


@pytest.fixture(autouse=True)
def _thread_leak_guard(request):
  global _THREAD_BASELINE
  import threading
  if _THREAD_BASELINE is None:
    _THREAD_BASELINE = {t.ident for t in threading.enumerate()}
  yield
  import time as _time
  leaked = [t for t in threading.enumerate()
            if t.ident not in _THREAD_BASELINE and t.is_alive()]
  if leaked:
    _time.sleep(1.0)   # grace for threads mid-teardown
    leaked = [t for t in threading.enumerate()
              if t.ident not in _THREAD_BASELINE and t.is_alive()]
  if leaked:
    names = [t.name for t in leaked]
    # adopt long-lived pool threads created lazily by libraries so only
    # the FIRST owning test is flagged
    _THREAD_BASELINE.update(t.ident for t in leaked)
    raise AssertionError(
        f'test leaked live threads: {names} — join them before returning '
        f'(they corrupt numpy errstate for every later test in this '
        f'worker)')
