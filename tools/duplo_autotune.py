"""Autotune the Duplo stud radius against this engine's contact solver.

The analog of the reference's entities/props/duplo/autotune.py:1-165:
the stud radius controls the interference fit between a lower brick's
studs and the tubes/walls of the brick above, and hence the force
needed to pull a clicked pair apart.  The reference targets a
separation force band of 6..18 N with a 10 N lower quartile
(autotune.py DESIRED_FORCES).  This tool bisects the stud radius to
hit a target force, measuring with the vmapped force-sweep harness in
`entities/duplo_utils.py`.

Usage:  python tools/duplo_autotune.py [target_force_N]
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dm_control_tpu.entities.duplo_utils import (SEP_DISPLACEMENT,
                                                 separation_displacements)


def measure_separation_force(stud_radius, lo=2.0, hi=24.0, iters=4):
  """Brackets the separation force for one radius via batched sweeps."""
  for _ in range(iters):
    forces = np.linspace(lo, hi, 6)
    disp = separation_displacements(stud_radius, forces)
    sep = disp > SEP_DISPLACEMENT
    if sep.all():
      lo, hi = forces[0] / 2, forces[0]
      continue
    if not sep.any():
      lo, hi = forces[-1], forces[-1] * 2
      continue
    k = int(np.argmax(sep))
    lo, hi = forces[k - 1], forces[k]
    if hi - lo < 0.5:
      break
  return 0.5 * (lo + hi)


def main():
  target = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
  lo_r, hi_r = 0.0044, 0.0052
  best = None
  for it in range(6):
    r = 0.5 * (lo_r + hi_r)
    f = measure_separation_force(r)
    print(f'iter {it}: stud_radius={r:.5f}  separation_force={f:.1f} N')
    best = (r, f)
    if abs(f - target) < 1.0:
      break
    if f < target:
      lo_r = r
    else:
      hi_r = r
  r, f = best
  print(f'tuned: STUD_RADIUS={r:.5f} ({f:.1f} N, target {target} N)')


if __name__ == '__main__':
  main()
