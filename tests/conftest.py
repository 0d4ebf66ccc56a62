"""Test configuration: force CPU with 8 virtual devices.

Sharding/collective tests compile and run on a virtual 8-device CPU mesh so
no TPU hardware is needed. Env vars must be set before jax initializes; the
axon TPU plugin ignores JAX_PLATFORMS from some contexts, so we also set the
config flag at import.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8'
  ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
