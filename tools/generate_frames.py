"""Regenerate the golden raytracer frames (reference:
mujoco/testing/generate_frames.py:28).

Usage: JAX_PLATFORMS=cpu python tools/generate_frames.py [name ...]
"""

import sys

sys.path.insert(0, '/root/repo')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

from dm_control_tpu.testing import image_utils  # noqa: E402


def main():
  names = sys.argv[1:] or sorted(image_utils.SEQUENCES)
  for name in names:
    frames = image_utils.render_sequence(name)
    image_utils.save_golden(name, frames)
    print(f'{name}: wrote {frames.shape} -> {image_utils.golden_path(name)}')


if __name__ == '__main__':
  main()
