"""Pipeline parallelism (PP): layer stages over a 'pp' mesh axis.

GPipe-style microbatch schedule expressed with shard_map + ppermute: the
decoder's layers split into pp stages (each device holds ONE stage's
integer weights — the leading axis of every weight array is the stage
dim, sharded P('pp')); microbatches enter stage 0 one per step, each
stage processes its current microbatch while its output rides a
ppermute hop to the next stage, and after n_micro + pp - 1 steps the
last stage has emitted every microbatch. The bubble fraction is
(pp - 1) / (n_micro + pp - 1) — the standard tradeoff the microbatch
count controls.

Activations move over ICI as ppermute hops; weights never move (the
point of PP: each device's HBM holds 1/pp of the layer stack, and
integer quantization multiplies that capacity 4-8x again).

No reference counterpart (SURVEY.md §2.6); north-star 'pp' in
tp/pp/dp/sp/ep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_local(x_micro, stage_weights, stage_fn,
                   axis_name: str = 'pp'):
  """Per-device body (call under shard_map over `axis_name`).

  x_micro [n_micro, Bm, ...] replicated microbatched inputs.
  stage_weights: pytree whose leaves carry THIS stage's weights
  (leading stage dim already stripped by the caller).
  stage_fn(x, stage_weights) -> y with x/y the same shape (stage output
  feeds the next stage's input).
  Returns [n_micro, Bm, ...] outputs of the LAST stage, replicated.
  """
  pp = jax.lax.psum(1, axis_name)
  my = jax.lax.axis_index(axis_name)
  n_micro = x_micro.shape[0]
  steps = n_micro + pp - 1
  buf0 = jnp.zeros_like(x_micro[0])
  outputs0 = jnp.zeros_like(x_micro)
  fwd = [(i, (i + 1) % pp) for i in range(pp)]  # wraparound hop is unused

  def body(t, carry):
    buf_in, outputs = carry
    # Stage 0 injects microbatch t (a dead value after the last one —
    # its results never reach `outputs`).
    inject = jax.lax.dynamic_index_in_dim(
        x_micro, jnp.minimum(t, n_micro - 1), keepdims=False)
    cur = jnp.where(my == 0, inject, buf_in)
    y = stage_fn(cur, stage_weights)
    # The last stage finishes microbatch t - (pp - 1) at step t.
    out_idx = t - (pp - 1)
    valid = jnp.logical_and(my == pp - 1, out_idx >= 0)
    write_idx = jnp.clip(out_idx, 0, n_micro - 1)
    prev = jax.lax.dynamic_index_in_dim(outputs, write_idx, keepdims=False)
    outputs = jax.lax.dynamic_update_index_in_dim(
        outputs, jnp.where(valid, y, prev), write_idx, 0)
    buf_in = jax.lax.ppermute(y, axis_name, fwd)
    return buf_in, outputs

  _, outputs = jax.lax.fori_loop(0, steps, body, (buf0, outputs0))
  # Only the last stage holds real outputs; replicate via a masked psum.
  mask = (my == pp - 1).astype(outputs.dtype)
  return jax.lax.psum(outputs * mask, axis_name)


def make_pipeline(mesh: Mesh, stage_fn, axis_name: str = 'pp'):
  """jitted f(x_micro, stage_weights_pytree) -> [n_micro, Bm, ...].

  Every leaf of stage_weights must have a leading stage dim of size
  mesh.shape[axis_name], placed with P(axis_name, ...). stage_fn sees the
  leaf with that dim stripped.
  """
  def local(x_micro, stage_weights):
    local_w = jax.tree_util.tree_map(lambda a: a[0], stage_weights)
    return pipeline_local(x_micro, local_w, stage_fn, axis_name)

  in_specs = (P(), P(axis_name))
  if hasattr(jax, 'shard_map'):
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=P(),
                       check_vma=False)
  else:  # pragma: no cover - legacy API
    from jax.experimental.shard_map import shard_map
    fn = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=P(),
                   check_rep=False)
  return jax.jit(fn)


def pipeline_reference(x_micro, stage_weights, stage_fn):
  """Unsharded oracle: run every stage sequentially per microbatch."""
  pp = jax.tree_util.tree_leaves(stage_weights)[0].shape[0]
  outs = []
  for m in range(x_micro.shape[0]):
    y = x_micro[m]
    for s in range(pp):
      w_s = jax.tree_util.tree_map(lambda a, s=s: a[s], stage_weights)
      y = stage_fn(y, w_s)
    outs.append(y)
  return jnp.stack(outs)


# ---------------------------------------------------------------------------
# Quantized-model integration: stage a gemma decoder's LAYER STACK over the
# 'pp' axis. Weights come from a quantized Graph (the quantizer pipeline's
# output) — int weight arrays stay int on device, per-channel scales ride as
# data (the reason the stage function takes scales explicitly: per-layer
# quantization params cannot be baked into a shared stage trace).
# ---------------------------------------------------------------------------


def extract_layer_stack(graph, signature_key: str = 'prefill'):
  """Stack per-layer constants of a (quantized) gemma graph.

  Returns {suffix: {'w': [L, ...], ('s': [L, n])}} — every constant
  tensor named '<sig>/layer_<li>/<suffix>' stacked over the layer dim,
  with per-channel quantization scales stacked alongside for integer
  weights. All layers must be structurally identical (the gemma builder
  guarantees it).
  """
  import numpy as np
  sig = graph.signature_by_key(signature_key)
  sg = graph.subgraphs[sig.subgraph_index]
  per_layer: dict = {}
  for t in sg.tensors:
    if not t.is_constant or '/layer_' not in t.name:
      continue
    rest = t.name.split('/layer_', 1)[1]
    li_s, suffix = rest.split('/', 1)
    data = np.asarray(graph.tensor_data(t))
    scale = None
    if t.quantization is not None:
      scale = np.asarray(t.quantization.scale, np.float32).reshape(-1)
    per_layer.setdefault(int(li_s), {})[suffix] = (data, scale)
  n_layers = max(per_layer) + 1
  stacked = {}
  for suffix, (w0, s0) in per_layer[0].items():
    entry = {'w': jnp.asarray(
        np.stack([per_layer[li][suffix][0] for li in range(n_layers)]))}
    if s0 is not None:
      entry['s'] = jnp.asarray(
          np.stack([per_layer[li][suffix][1] for li in range(n_layers)]))
    stacked[suffix] = entry
  return stacked


def make_gemma_layer_fn(cfg, positions, mask):
  """stage_fn factory: applies a contiguous run of decoder layers.

  Pure-jax twin of the gemma builder's layer block (models/gemma.py
  _build_signature: RMS_NORM -> q/k/v (or fused qkv) FC -> ROPE ->
  grouped attention over the chunk -> o-proj -> residual -> RMS_NORM ->
  GeGLU FFN -> residual) for PREFILL FROM EMPTY CACHES — the zero-cache
  rows beyond the chunk are masked to exp(-1e9) = 0 in both
  formulations, so attending over [T] here equals the graph's DUS-into-
  [S]-window attention exactly.

  positions [B, T] int32; mask [B, 1, G*T, S] additive (make_inputs
  layout: grouped score row g*T + t).
  """
  import math
  nq, nk, h = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
  g = nq // nk
  eps = cfg.norm_eps

  def deq(entry):
    w = entry['w'].astype(jnp.float32)
    if 's' in entry:
      w = w * entry['s'][:, None]
    return w

  def rms_norm(x, gamma):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    return x * jax.lax.rsqrt(var + eps).astype(x.dtype) * gamma

  def rope(x, pos):
    half = h // 2
    import numpy as np
    freqs = cfg.rope_base ** (-np.arange(0, half, dtype=np.float32) / half)
    angles = pos[..., None].astype(jnp.float32) * freqs
    sin, cos = jnp.sin(angles)[..., None, :], jnp.cos(angles)[..., None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)

  def apply_layer(x, lw):
    b, t, d = x.shape
    xn = rms_norm(x, lw['pre_attn_norm/gamma']['w'])
    if 'attn/qkv/w' in lw:
      qkv = xn @ deq(lw['attn/qkv/w']).T
      q = qkv[..., : nq * h]
      k = qkv[..., nq * h: (nq + nk) * h]
      v = qkv[..., (nq + nk) * h:]
    else:
      q = xn @ deq(lw['attn/q/w']).T
      k = xn @ deq(lw['attn/k/w']).T
      v = xn @ deq(lw['attn/v/w']).T
    qr = rope(q.reshape(b, t, nq, h), positions)
    kr = rope(k.reshape(b, t, nk, h), positions)
    qt = qr.transpose(0, 2, 1, 3).reshape(b, nk, g * t, h)
    kt = kr.transpose(0, 2, 1, 3)
    vt = v.reshape(b, t, nk, h).transpose(0, 2, 1, 3)
    scores = jnp.einsum('bnrh,bnsh->bnrs', qt, kt) / math.sqrt(h)
    scores = scores + mask[..., :t]
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum('bnrs,bnsh->bnrh', probs, vt)
    ctx2 = ctx.reshape(b, nq, t, h).transpose(0, 2, 1, 3).reshape(
        b, t, nq * h)
    x = x + ctx2 @ deq(lw['attn/o/w']).T
    fn = rms_norm(x, lw['pre_ffn_norm/gamma']['w'])
    if 'ffw/gate_up/w' in lw:
      gu = fn @ deq(lw['ffw/gate_up/w']).T
      f = gu.shape[-1] // 2
      gate, up = gu[..., :f], gu[..., f:]
    else:
      gate = fn @ deq(lw['ffw/gate/w']).T
      up = fn @ deq(lw['ffw/up/w']).T
    hh = jax.nn.gelu(gate, approximate=True) * up
    return x + hh @ deq(lw['ffw/down/w']).T

  def stage_fn(x, stage_weights):
    n_local = jax.tree_util.tree_leaves(stage_weights)[0].shape[0]
    for j in range(n_local):
      lw = jax.tree_util.tree_map(lambda a, j=j: a[j], stage_weights)
      x = apply_layer(x, lw)
    return x

  return stage_fn


def staged_layers_from_graph(graph, cfg, mesh: Mesh, positions, mask,
                             signature_key: str = 'prefill',
                             axis_name: str = 'pp'):
  """Build the pipelined layer-stack runner for a quantized gemma graph.

  Returns (run, stage_weights): run(x_micro [n_micro, Bm, T, D]) executes
  the full layer stack as a GPipe schedule over the mesh's `axis_name`
  axis (each device holds num_layers/pp layers' INT weights + scales);
  stage_weights is the pp-leading stacked pytree (already shaped for
  make_pipeline).
  """
  stacked = extract_layer_stack(graph, signature_key)
  pp = mesh.shape[axis_name]
  n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
  if n_layers % pp:
    raise ValueError(f'{n_layers} layers do not divide over pp={pp}.')
  stage_weights = jax.tree_util.tree_map(
      lambda a: a.reshape((pp, n_layers // pp) + a.shape[1:]), stacked)
  stage_fn = make_gemma_layer_fn(cfg, positions, mask)
  run = make_pipeline(mesh, stage_fn, axis_name)
  return run, stage_weights
