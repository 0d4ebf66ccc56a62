"""Data-parallel calibration: shard samples, merge QSVs across shards.

Calibration is embarrassingly parallel over samples; on a pod slice each
host calibrates its shard of the dataset on its local chips and the QSV
dicts merge cross-shard at the end:

  * min/max  -> elementwise extremes (conservative union of the shards'
    smoothed ranges),
  * GPTQ Hessians -> sample-weighted average (2/n * XᵀX is a mean over
    samples, so the weighted average over shards is exact),
  * anything else -> first shard wins.

The multi-host path rides `jax.experimental.multihost_utils` (allgather of
the host-local QSV pytree over DCN); single-process it degrades to a local
merge so tests can exercise the exact same code path.

Parity note: the reference (google-ai-edge/ai-edge-quantizer
`calibrator.py`) is single-process only — this subsystem is the TPU-native
extension for pod-scale calibration sets.
"""

from __future__ import annotations

import concurrent.futures
from typing import Optional, Sequence

import numpy as np

from ai_edge_quantizer_tpu.graph import ir
from ai_edge_quantizer_tpu.pipeline import calibrator as calibrator_lib
from ai_edge_quantizer_tpu.recipe import recipe_manager as rm


def shard_dataset(calibration_dataset: dict, num_shards: int,
                  shard_index: Optional[int] = None):
  """Round-robin split {signature: [samples]} into per-shard datasets.

  Returns the list of all shards, or just shard `shard_index` if given.
  Signatures whose sample count is < num_shards leave some shards without
  that signature (empty lists are dropped so Calibrator skips them).
  """
  if num_shards < 1:
    raise ValueError(f'num_shards must be >= 1, got {num_shards}')
  shards = [dict() for _ in range(num_shards)]
  for key, samples in calibration_dataset.items():
    samples = list(samples)
    for i in range(num_shards):
      part = samples[i::num_shards]
      if part:
        shards[i][key] = part
  if shard_index is not None:
    return shards[shard_index]
  return shards


def merge_qsv_shards(qsv_shards: Sequence[dict]) -> dict:
  """Merge per-shard model QSVs {tensor_name: {'min','max',...}}."""
  qsv_shards = [s for s in qsv_shards if s]
  if not qsv_shards:
    return {}
  merged: dict = {}
  for shard in qsv_shards:
    for name, qsv in shard.items():
      if name not in merged:
        merged[name] = dict(qsv)
        continue
      cur = merged[name]
      if 'min' in cur and 'min' in qsv:
        cur['min'] = np.minimum(cur['min'], qsv['min'])
      if 'max' in cur and 'max' in qsv:
        cur['max'] = np.maximum(cur['max'], qsv['max'])
      old_h, new_h = cur.get('hessian'), qsv.get('hessian')
      if old_h is not None and new_h is not None:
        old_n = cur.get('num_samples', 1)
        new_n = qsv.get('num_samples', 1)
        total = old_n + new_n
        cur['hessian'] = (
            np.asarray(old_h) * (old_n / total)
            + np.asarray(new_h) * (new_n / total))
        cur['num_samples'] = total
      elif new_h is not None:
        cur['hessian'] = new_h
        cur['num_samples'] = qsv.get('num_samples', 1)
  return merged


def calibrate_sharded(
    float_graph: ir.Graph,
    calibration_dataset: dict,
    model_recipe_manager: rm.RecipeManager,
    num_shards: int = 2,
    parallel: bool = False,
) -> dict:
  """Single-process sharded calibration (num_shards independent Calibrators).

  parallel=True runs shards on a thread pool — useful when the capture
  runner releases the GIL into device execution. Each shard gets its OWN
  Calibrator (and jitted capture program), so there is no shared mutable
  state beyond the read-only graph.
  """
  shards = shard_dataset(calibration_dataset, num_shards)

  def run_shard(shard: dict) -> dict:
    if not shard:
      return {}
    calib = calibrator_lib.Calibrator(float_graph)
    calib.calibrate(shard, model_recipe_manager)
    return calib.get_model_qsvs()

  if parallel:
    with concurrent.futures.ThreadPoolExecutor(
        max_workers=num_shards) as pool:
      results = list(pool.map(run_shard, shards))
  else:
    results = [run_shard(s) for s in shards]
  return merge_qsv_shards(results)


def calibrate_multihost(
    float_graph: ir.Graph,
    calibration_dataset: dict,
    model_recipe_manager: rm.RecipeManager,
) -> dict:
  """Pod-scale calibration: each jax process calibrates its dataset shard.

  Call under `jax.distributed` on every host with the FULL dataset; each
  process takes its round-robin shard, calibrates locally, and the QSVs are
  allgathered + merged so every host returns the identical merged dict.
  Single-process this is exactly `calibrate_sharded(num_shards=1)`.
  """
  import jax

  n = jax.process_count()
  if n == 1:
    return calibrate_sharded(
        float_graph, calibration_dataset, model_recipe_manager, num_shards=1)
  local = shard_dataset(calibration_dataset, n, jax.process_index())
  calib = calibrator_lib.Calibrator(float_graph)
  if local:
    calib.calibrate(local, model_recipe_manager)
  local_qsvs = calib.get_model_qsvs()
  return merge_qsv_shards(_allgather_qsvs(local_qsvs, n))


def _allgather_qsvs(local_qsvs: dict, num_processes: int) -> list:
  """Allgather host-local QSV dicts over DCN (object tree via bytes).

  QSV shapes can differ per host (a host may have seen zero samples for a
  signature), so we gather a pickled blob padded to the global max length
  rather than a structured pytree.
  """
  import pickle

  import jax
  import jax.numpy as jnp
  from jax.experimental import multihost_utils

  blob = np.frombuffer(pickle.dumps(local_qsvs), dtype=np.uint8)
  max_len = int(multihost_utils.process_allgather(
      jnp.asarray([blob.size], jnp.int32)).max())
  padded = np.zeros((max_len,), np.uint8)
  padded[: blob.size] = blob
  sizes = multihost_utils.process_allgather(
      jnp.asarray([blob.size], jnp.int32)).reshape(-1)
  blobs = multihost_utils.process_allgather(jnp.asarray(padded))
  blobs = np.asarray(blobs).reshape(num_processes, max_len)
  out = []
  for i in range(num_processes):
    size = int(np.asarray(sizes)[i])
    out.append(pickle.loads(blobs[i, :size].tobytes()))
  return out
