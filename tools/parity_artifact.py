"""Generate PARITY_r{N}.json: the measured oracle-parity error per task
row (VERDICT r4 item 7 — trend the fidelity ceilings as data, not just
pass/fail against loose tolerances).

Runs the lockstep parity battery with DMC_TPU_PARITY_OUT set; each test
appends its measured max reward/obs error to a JSONL file; this script
assembles the rows into one artifact and, when a previous round's
artifact exists, prints the per-row ratio so regressions are visible.

Usage: python tools/parity_artifact.py [round_number] [pytest args...]
"""

import glob
import json
import os
import subprocess
import sys
import tempfile


def main():
  rnd = sys.argv[1] if len(sys.argv) > 1 else '05'
  extra = sys.argv[2:]
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  out_path = os.path.join(repo, f'PARITY_r{rnd}.json')

  with tempfile.NamedTemporaryFile(suffix='.jsonl', delete=False) as f:
    jsonl = f.name
  env = dict(os.environ, DMC_TPU_PARITY_OUT=jsonl)
  proc = subprocess.run(
      [sys.executable, '-m', 'pytest', 'tests/test_task_parity.py',
       'tests/test_jaco_parity.py', '-q'] + extra,
      cwd=repo, env=env)

  rows = {}
  with open(jsonl) as f:
    for line in f:
      line = line.strip()
      if not line:
        continue
      row = json.loads(line)
      rows[row.pop('row')] = row

  prev = {}
  for path in sorted(glob.glob(os.path.join(repo, 'PARITY_r*.json'))):
    if path != out_path:
      try:
        prev = json.load(open(path)).get('rows', {})
      except Exception:
        pass

  for name, row in sorted(rows.items()):
    old = prev.get(name, {}).get('max_obs_err')
    if old and row['max_obs_err'] > 0:
      row['obs_err_vs_prev'] = round(row['max_obs_err'] / max(old, 1e-300), 3)

  artifact = {
      'round': rnd,
      'pytest_rc': proc.returncode,
      'n_rows': len(rows),
      'rows': rows,
  }
  with open(out_path, 'w') as f:
    json.dump(artifact, f, indent=1, sort_keys=True)
  os.unlink(jsonl)
  print(f'wrote {out_path} ({len(rows)} rows, pytest rc={proc.returncode})')


if __name__ == '__main__':
  main()
