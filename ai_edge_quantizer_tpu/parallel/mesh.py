"""Device mesh construction for multi-chip / multi-host serving.

Axes: 'dp' (data/batch), 'tp' (tensor parallel). ICI carries 'tp'
collectives (weight all-gathers / activation psums); 'dp' only syncs at
batch boundaries, so it can ride DCN across hosts.

The same code path works on real TPU slices and on CPU with
`--xla_force_host_platform_device_count=N` virtual devices (tests and the
driver's multichip dry-run).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
  """A ('dp', 'tp') mesh over the first n_devices.

  Defaults: all devices on the 'tp' axis (single-host serving: tensor
  parallelism over ICI); pass dp to split hosts/replicas.
  """
  devices = jax.devices()
  n = n_devices or len(devices)
  devices = devices[:n]
  if dp is None and tp is None:
    dp, tp = 1, n
  elif dp is None:
    dp = n // tp
  elif tp is None:
    tp = n // dp
  if dp * tp != n:
    raise ValueError(f'dp*tp = {dp}*{tp} != n_devices = {n}.')
  arr = np.asarray(devices).reshape(dp, tp)
  return Mesh(arr, axis_names=('dp', 'tp'))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def spec(mesh: Mesh, *axes) -> NamedSharding:
  return NamedSharding(mesh, P(*axes))
