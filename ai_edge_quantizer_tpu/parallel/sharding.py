"""Sharding rules for quantized graphs: weights, scales, and KV caches.

Design (scaling-book recipe): pick a mesh, annotate shardings on the
executor's weight store and signature inputs, jit the executor's pure
function under those shardings, and let XLA insert the collectives.

Quantized-weight sharding rule: shard along the QUANTIZED (channel)
dimension so per-channel scales shard congruently with the data and no
scale gathers are ever needed. Packed sub-byte weights pack along the
non-sharded axis, so shard boundaries never split a byte.

  FULLY_CONNECTED w [out, in]   -> P('tp', None)   (column parallel)
  EMBEDDING_LOOKUP table [V, D] -> P('tp', None)   (vocab sharded)
  KV caches [B, NK, S, H]       -> P('dp') on batch
  activations [B, ...]          -> P('dp') on batch

Alternating column/row parallel FC pairs (Megatron style) are expressed by
`ROW_PARALLEL_HINTS` name patterns: weights whose tensor name matches shard
the IN dimension -> P(None, 'tp'), making XLA emit a psum right after the
matmul instead of gathering activations.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ai_edge_quantizer_tpu.execution import executor as executor_lib
from ai_edge_quantizer_tpu.graph import ir

# Weight names matching these patterns contract over the sharded dim (row
# parallel): the attention output proj and the ffn down proj.
ROW_PARALLEL_HINTS = (r'attn/o/w', r'ffw/down/w')


def _weight_roles(graph: ir.Graph) -> dict:
  """(sg_idx, tensor_id) -> 'fc' | 'embedding' for shardable weights."""
  roles: dict = {}
  for sg_idx, sg in enumerate(graph.subgraphs):
    for op in sg.ops:
      if op.opcode == 'FULLY_CONNECTED' and len(op.inputs) > 1 \
          and op.inputs[1] >= 0:
        roles[(sg_idx, op.inputs[1])] = 'fc'
      elif op.opcode == 'EMBEDDING_LOOKUP' and len(op.inputs) > 1 \
          and op.inputs[1] >= 0:
        roles[(sg_idx, op.inputs[1])] = 'embedding'
  return roles


def weight_shardings(
    graph: ir.Graph,
    weights: dict,
    mesh: Mesh,
) -> dict:
  """NamedSharding per executor weight, congruent with quantization."""
  roles = _weight_roles(graph)
  tp = mesh.shape['tp']
  out: dict = {}
  for key, arr in weights.items():
    sg_idx, tid = key
    if tid <= -2000:
      # Synthetic concatenated gate_up weight (executor MLP fusion,
      # pattern B: tid = -2000 - gate_tid). Row-concat of two
      # column-parallel projections stays column-parallel; inherit the
      # gate tensor's role and hints.
      tid = -2000 - tid
    elif tid < 0:
      # Synthetic kernel-layout weight (executor MLP fusion stores the
      # grouped down projection under tid = -1000 - canonical_tid);
      # inherit the canonical tensor's role and row/column hints. The
      # grouped layout keeps rows = output channels and packs K bytes
      # along axis 1, so the same P spec stays congruent.
      tid = -1000 - tid
    tensor = graph.subgraphs[sg_idx].tensors[tid]
    role = roles.get((sg_idx, tid))
    spec = P()
    if role in ('fc', 'embedding') and arr.ndim == 2:
      row_parallel = any(
          re.search(pat, tensor.name) for pat in ROW_PARALLEL_HINTS)
      if row_parallel and arr.shape[1] % tp == 0:
        spec = P(None, 'tp')
      elif arr.shape[0] % tp == 0:
        spec = P('tp', None)
      elif arr.shape[1] % tp == 0:
        spec = P(None, 'tp')
    elif arr.ndim == 1 and arr.shape[0] % tp == 0 and role is not None:
      spec = P('tp')
    out[key] = NamedSharding(mesh, spec)
  return out


def input_shardings(
    graph: ir.Graph,
    signature_key: str,
    mesh: Mesh,
    batch_axis: str = 'dp',
) -> dict:
  """Shard signature inputs on the batch dimension where divisible."""
  sig = graph.signature_by_key(signature_key)
  sg = graph.subgraphs[sig.subgraph_index]
  dp = mesh.shape[batch_axis]
  out: dict = {}
  for name, tid in sig.inputs.items():
    t = sg.tensors[tid]
    if t.shape and t.shape[0] % dp == 0 and t.shape[0] >= dp and len(
        t.shape) > 1:
      out[name] = NamedSharding(mesh, P(batch_axis))
    else:
      out[name] = NamedSharding(mesh, P())
  return out


def sharded_signature_runner(
    executor: executor_lib.GraphExecutor,
    signature_key: str,
    mesh: Mesh,
):
  """A jitted signature function with mesh-sharded weights and inputs.

  Returns (fn, sharded_weights): call fn(sharded_weights, inputs). XLA
  derives the collective schedule (psums over 'tp', batch-local 'dp') from
  the annotations.
  """
  import functools

  w_shard = weight_shardings(executor.graph, executor._weights, mesh)
  in_shard = input_shardings(executor.graph, signature_key, mesh)
  sharded_weights = {
      k: jax.device_put(v, w_shard[k]) for k, v in executor._weights.items()
  }
  sig = executor.graph.signature_by_key(signature_key)
  fn = functools.partial(
      executor._run_signature, sig.subgraph_index, signature_key, False)
  jitted = jax.jit(
      fn,
      in_shardings=(w_shard, in_shard),
  )
  return jitted, sharded_weights
