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
