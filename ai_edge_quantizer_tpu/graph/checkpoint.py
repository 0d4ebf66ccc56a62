"""Sharded checkpoint I/O for serving weight stores (orbax-backed).

Multi-GB quantized weights restore directly to device (optionally onto a
mesh sharding) without a host-side staging copy — the serving analog of
the reference's mmap model loads, at pod scale.

The `.aeqg` container (graph/serialize.py) remains the canonical model
format; this module checkpoints the EXECUTOR's weight dict (integer
tensors + any packed layouts) for fast serving restarts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _flatten(weights: dict) -> dict:
  """(sg_idx, tid) keys -> string keys orbax accepts."""
  return {f'{sg}__{tid}': v for (sg, tid), v in weights.items()}


def _unflatten(tree: dict) -> dict:
  out = {}
  for key, v in tree.items():
    sg, tid = key.split('__')
    out[(int(sg), int(tid))] = v
  return out


def save_serving_weights(weights: dict, path: str) -> None:
  """Checkpoint an executor weight dict to `path` (a directory)."""
  import orbax.checkpoint as ocp

  path = os.path.abspath(path)
  ckptr = ocp.PyTreeCheckpointer()
  ckptr.save(path, _flatten(weights), force=True)


def load_serving_weights(
    path: str,
    shardings: Optional[dict] = None,
) -> dict:
  """Restore an executor weight dict; `shardings` ((sg, tid) ->
  jax.sharding.Sharding) places arrays directly onto the mesh."""
  import orbax.checkpoint as ocp

  path = os.path.abspath(path)
  ckptr = ocp.PyTreeCheckpointer()
  if shardings:
    flat_shardings = _flatten(shardings)
    restore_args = {
        key: ocp.ArrayRestoreArgs(sharding=sharding)
        for key, sharding in flat_shardings.items()
    }
    restored = ckptr.restore(path, restore_args=restore_args)
  else:
    restored = ckptr.restore(path)
  return _unflatten(restored)
