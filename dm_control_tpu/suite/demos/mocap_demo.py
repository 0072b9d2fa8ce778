"""CMU mocap playback demo (reference: suite/demos/mocap_demo.py).

Parses a `.amc` clip, drives the 56-DoF CMU humanoid's qpos through the
trajectory, and renders frames to PNG files with the analytic raytracer
(the reference plots matplotlib windows; this environment is headless).

    python -m dm_control_tpu.suite.demos.mocap_demo --filename clip.amc \
        --out /tmp/mocap_frames --max-frames 40
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def play(filename: str, out_dir: str, max_frames: int = 40,
         dt: float = 0.03, height: int = 120, width: int = 160,
         distance: float = 4.0):
  from dm_control_tpu import viewer
  from dm_control_tpu._src import engine, forward, render, smooth
  from dm_control_tpu.suite import common
  from dm_control_tpu.suite.utils import parse_amc

  m = engine.load_model(common.model_path('humanoid_CMU.xml'))
  converted = parse_amc.convert(filename, m, dt)
  qpos = np.asarray(converted.qpos).T
  os.makedirs(out_dir, exist_ok=True)

  d = forward.make_data(m)
  kin = jax.jit(lambda dd: smooth.kinematics(m, dd))
  import jax.numpy as jnp
  cam = render.MovableCamera(m, height, width, distance=distance,
                             azimuth=90.0, elevation=-15.0)
  n = min(max_frames, qpos.shape[0])
  stride = max(1, qpos.shape[0] // n)
  paths = []
  for i in range(0, n * stride, stride):
    di = kin(d.replace(qpos=jnp.asarray(qpos[i], d.qpos.dtype)))
    cam.set_pose(np.asarray(di.xpos[1]), distance, 90.0, -15.0)
    rgb = np.asarray(cam.render(di))
    path = os.path.join(out_dir, f'frame_{i:05d}.png')
    viewer.save_png(path, (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    paths.append(path)
  return paths


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--filename', required=True)
  p.add_argument('--out', default='/tmp/mocap_frames')
  p.add_argument('--max-frames', type=int, default=40)
  args = p.parse_args()
  paths = play(args.filename, args.out, args.max_frames)
  print(f'wrote {len(paths)} frames to {args.out}')


if __name__ == '__main__':
  main()
