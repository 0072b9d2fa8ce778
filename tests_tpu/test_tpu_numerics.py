"""On-chip numerics battery: the checks VERDICT r2 mandated run on real
hardware every round (kernel-vs-XLA parity, f32-vs-f64 trajectory
drift, kernel speedup).  Measurement code lives in
dm_control_tpu.testing.tpu_checks; tools/tpu_check.py records the same
measurements as TPUCHECK_r{N}.json.
"""

import pytest

from dm_control_tpu.testing import tpu_checks


@pytest.mark.parametrize('domain,task_name', tpu_checks.KERNEL_MODELS)
def test_kernel_parity_on_chip(domain, task_name):
  """Mosaic-compiled Newton kernel vs the XLA core at float32.

  Bounds are the measured float32 conditioning floor (see
  tests/test_pallas.py::test_kernel_matches_xla_tpu): running the XLA
  core itself twice at f32 shows the same ~5e-3 max / ~2e-5 mean scaled
  disagreement on ill-conditioned lanes — opt.tolerance=1e-8 is an f64
  setting no f32 implementation can reach."""
  res = tpu_checks.kernel_parity_one(domain, task_name, batch=128)
  assert res['mean_err'] <= 1e-4, res
  assert res['max_err'] <= 5e-2, res
  assert res['lanes_over_1e3'] <= res['batch'] // 10, res


@pytest.mark.parametrize(
    'domain,task_name,horizon',
    tpu_checks.DRIFT_TASKS,
)
def test_trajectory_drift_f32_vs_f64(domain, task_name, horizon):
  """TPU f32 open-loop rollout vs CPU f64 oracle rollout.

  The bound is calibrated per run against the CPU float32 chaos floor
  (a third rollout: same init, same actions, CPU f32): over these
  horizons f32 rounding alone drifts the state by an amount that the
  TPU must match, not exceed — measured round 3, TPU f32 and CPU f32
  drift agree to 3 significant digits on all 8 tasks, while r2's
  broken Mosaic kernel measured 2.9e+2."""
  res = tpu_checks.trajectory_drift([(domain, task_name, horizon)])
  r = res[f'{domain}-{task_name}']
  assert r['max_scaled_qpos_err'] <= max(5e-2, 3 * r['cpu_f32_floor']), res


def test_kernel_speedup_positive():
  """The monolithic Newton kernel must beat the XLA core on realistic
  mid-episode states for large-nv models (humanoid class), where it is
  the production path's main lever (round 5: 1.7x at batch 4096).

  Small-nv rows are recorded for trending but not asserted: the
  isolated realistic-state solve measures cheetah at ~0.65x while the
  END-TO-END bench measures the kernel WINNING there (575k vs 506k
  env-steps/s with DMC_TPU_NEWTON_KERNEL=off, round 5) — in the full
  step the kernel's single launch replaces a chain of small ops that
  overlap worse with the rest of the pipeline than they do standalone.
  The dispatch gate is therefore validated by bench A/B, not by this
  isolated number."""
  res = tpu_checks.kernel_speedup(batch=1024)
  for name, r in res.items():
    if r['gate_enabled'] and name.startswith('humanoid'):
      assert r['speedup'] >= 1.0, (name, r)


def test_linalg_kernel_speedup():
  """The batched SPD factor/solve Pallas tier — the production path
  under the environment vmap — must beat XLA's batched custom-call
  path at every shipped size (VERDICT r4: the real ~9x humanoid lever
  previously had no speedup entry at all)."""
  res = tpu_checks.linalg_speedup(batch=4096)
  for name, r in res.items():
    assert r['speedup_vs_customcall'] >= 1.5, (name, r)
