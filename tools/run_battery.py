"""Full-battery runner with bounded worker lifetimes.

The battery's residual failure mode (round 5, fully characterized in
BATTERY_RUNS.md) is XLA:CPU state corruption in LONG-LIVED xdist
workers: after a worker has compiled/run enough large float64
executables it either SIGABRTs (xdist 'node down') or goes silently
wrong (NaN outputs from kernels that pass in a fresh process).  Per-row
subprocess isolation and RSS-triggered cache clearing shrink the window
but a 790-test battery still walks into it a few times per run.

This runner bounds the walk: the battery executes as SEQUENTIAL pytest
invocations, each with a FRESH -n 6 worker pool, so no worker ever
accumulates more than one chunk's worth of executables.  Same tests,
same shipped xdist config inside each chunk, one aggregated exit code.

Usage: python tools/run_battery.py [extra pytest args...]
"""

import os
import subprocess
import sys
import time

# chunks ordered light -> heavy; each gets a fresh worker pool.  The
# heavy f64 oracle-parity files run LAST and alone, so their compiles
# never share a worker with (or corrupt) the rest of the battery.
CHUNKS = [
    # 1: everything except the suite-wide and oracle-parity batteries
    ['tests/', '--ignore=tests/test_suite.py',
     '--ignore=tests/test_suite_determinism.py',
     '--ignore=tests/test_task_parity.py',
     '--ignore=tests/test_jaco_parity.py'],
    # 2: suite conformance + determinism (many mid-size f64 compiles)
    ['tests/test_suite.py', 'tests/test_suite_determinism.py'],
    # 3: oracle parity (the biggest f64 compiles: dog, humanoid_CMU)
    ['tests/test_task_parity.py', 'tests/test_jaco_parity.py'],
]


def main():
  extra = sys.argv[1:]
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  t0 = time.time()
  rcs = []
  for i, chunk in enumerate(CHUNKS, 1):
    print(f'=== battery chunk {i}/{len(CHUNKS)}: {chunk[0]} ... ===',
          flush=True)
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', '-q'] + chunk + extra, cwd=repo)
    rcs.append(proc.returncode)
  dt = time.time() - t0
  print(f'=== battery done in {dt / 60:.1f} min; chunk rcs={rcs} ===')
  sys.exit(max(rcs))


if __name__ == '__main__':
  main()
