"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Tests run on the CPU backend (fast compiles, float64 available for
bit-parity against the reference oracle); the TPU path is exercised by
bench.py and __graft_entry__.py.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_enable_x64', True)

SUITE_DIR = '/root/reference/dm_control/suite'
