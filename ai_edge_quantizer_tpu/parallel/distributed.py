"""Multi-host initialization for pod-slice serving.

Thin, documented wrapper over `jax.distributed`: call `initialize()` once
per host process before building meshes; every host then sees the global
device set and `parallel.mesh.make_mesh` spans the slice. 'tp' collectives
ride ICI within the slice; keep 'dp' as the cross-host axis so only batch
handoff crosses DCN.

Typical pod-slice launch (per host):

    from ai_edge_quantizer_tpu.parallel import distributed, mesh
    distributed.initialize()            # env-driven on TPU pods
    m = mesh.make_mesh(dp=num_hosts)    # dp spans hosts, tp spans ICI
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
  """Initialize jax.distributed (no-op when already initialized).

  On Cloud TPU pods all arguments resolve from the environment; pass them
  explicitly for other clusters.
  """
  try:
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
  except RuntimeError as e:
    if 'already' not in str(e).lower():
      raise


def is_multi_host() -> bool:
  return jax.process_count() > 1


def local_batch_slice(global_batch: int):
  """This host's slice of a dp-sharded global batch."""
  per_host = global_batch // jax.process_count()
  start = jax.process_index() * per_host
  return slice(start, start + per_host)
