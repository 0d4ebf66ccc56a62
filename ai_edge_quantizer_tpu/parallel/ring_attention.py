"""Sequence-parallel attention over int8-quantized KV caches.

The long-context subsystem (SURVEY §5: absent in the reference — its only
long-context machinery is KV-cache QSV alignment; sequence scaling is new
TPU-native work). The KV cache shards along the SEQUENCE axis over a mesh
axis ('sp'); attention runs without ever materializing the full cache on
one chip:

  * decode (one query token): each device computes flash-attention partial
    statistics (running max m, normalizer l, accumulator acc) over its KV
    shard, then one log-sum-exp combine via pmax/psum over 'sp'. One
    collective hop, no ring needed.
  * prefill (T query tokens, also sequence-sharded): classic ring
    attention — KV blocks rotate around the 'sp' axis with `ppermute`
    while every device keeps running flash statistics for its local query
    block; causality comes from global position ids that travel with the
    blocks. Compute on block i overlaps the transfer of block i+1 (XLA
    schedules the collective-permute DMA concurrently).

Integer KV numerics match `kernels/pallas_attention.py` (closed-form
zero-point corrections):
    score -= zp_k * sum(q)          (k dequant folded into the logits)
    ctx    = (acc / l - zp_v) * v_scale

All math in f32; int8 (or int4-container) KV streams at storage width.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _partial_stats(q_f32, k_q, k_scale, k_zero_point, mask):
  """Local flash stats: scores -> (m, p) with int-k zp correction.

  q_f32: [B, N, R, H] float32 query rows; k_q: [B, N, S, H] int container;
  mask: additive [B, R, S] or [B, 1, S].
  """
  h = q_f32.shape[-1]
  scores = jnp.einsum('bnrh,bnsh->bnrs', q_f32, k_q.astype(jnp.float32))
  scores = scores - k_zero_point * jnp.sum(q_f32, axis=-1, keepdims=True)
  scores = scores * (k_scale / (h ** 0.5))
  scores = scores + mask[:, None, :, :].astype(jnp.float32)
  return scores


def decode_attention_int8_seqsharded(
    q: jax.Array,
    k_q: jax.Array,
    v_q: jax.Array,
    k_scale: float,
    v_scale: float,
    mask: jax.Array,
    mesh: Mesh,
    axis: str = 'sp',
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
) -> jax.Array:
  """Decode attention with the int8 KV cache sharded on sequence.

  q [B, N, G, H] (G query heads per KV head); k_q/v_q [B, N, S, H] int8,
  sharded P(None, None, axis, None); mask additive [B, S] sharded
  P(None, axis). Returns ctx [B, N, G, H] float32, replicated over `axis`.
  """

  def local(q, k_q, v_q, mask):
    qf = q.astype(jnp.float32)
    scores = _partial_stats(qf, k_q, k_scale, k_zero_point,
                            mask[:, None, :])  # [B,N,G,S_local]
    m = jnp.max(scores, axis=-1, keepdims=True)
    m_global = jax.lax.pmax(m, axis)
    p = jnp.exp(scores - m_global)
    l = jnp.sum(p, axis=-1)                                  # [B,N,G]
    acc = jnp.einsum('bngs,bnsh->bngh', p, v_q.astype(jnp.float32))
    l_tot = jax.lax.psum(l, axis)
    acc_tot = jax.lax.psum(acc, axis)
    ctx = acc_tot / l_tot[..., None] - v_zero_point
    return (ctx * v_scale).astype(q.dtype)

  spec_kv = P(None, None, axis, None)
  fn = jax.shard_map(
      local, mesh=mesh,
      in_specs=(P(), spec_kv, spec_kv, P(None, axis)),
      out_specs=P(),
      check_vma=False,
  )
  return fn(q, k_q, v_q, mask)


def ring_attention_int8(
    q: jax.Array,
    k_q: jax.Array,
    v_q: jax.Array,
    k_scale: float,
    v_scale: float,
    q_positions: jax.Array,
    kv_positions: jax.Array,
    mesh: Mesh,
    axis: str = 'sp',
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
) -> jax.Array:
  """Causal ring attention: q AND int8 KV sequence-sharded over `axis`.

  q [B, N, T, H] (per-KV-head queries; repeat KV outside for GQA),
  k_q/v_q [B, N, S, H] int8, q_positions [T] / kv_positions [S] global
  position ids (int32). T and S shard over `axis`; KV blocks rotate with
  ppermute while flash stats accumulate per local query block.
  Returns ctx [B, N, T, H], sharded on T like q.
  """
  n_dev = mesh.shape[axis]

  def local(q, k_blk, v_blk, q_pos, kv_pos):
    qf = q.astype(jnp.float32)
    b, n, t, h = qf.shape

    neg = jnp.float32(-1e30)
    m0 = jnp.full((b, n, t, 1), neg, jnp.float32)
    l0 = jnp.zeros((b, n, t), jnp.float32)
    acc0 = jnp.zeros((b, n, t, h), jnp.float32)

    def step(i, carry):
      k_c, v_c, pos_c, m, l, acc = carry
      causal = (q_pos[:, None] >= pos_c[None, :]).astype(jnp.float32)
      mask = jnp.where(causal > 0, 0.0, neg)          # [T_local, S_local]
      mask = jnp.broadcast_to(mask[None], (b,) + mask.shape)
      scores = _partial_stats(qf, k_c, k_scale, k_zero_point, mask)
      m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
      alpha = jnp.exp(m - m_new)[..., 0]              # [B,N,T]
      p = jnp.exp(scores - m_new)
      sum_p = jnp.sum(p, axis=-1)
      pv = jnp.einsum('bnts,bnsh->bnth', p, v_c.astype(jnp.float32))
      l = l * alpha + sum_p
      acc = acc * alpha[..., None] + pv
      # Rotate the KV block (and its positions) one hop around the ring;
      # the DMA overlaps the next iteration's compute.
      perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
      k_c = jax.lax.ppermute(k_c, axis, perm)
      v_c = jax.lax.ppermute(v_c, axis, perm)
      pos_c = jax.lax.ppermute(pos_c, axis, perm)
      return (k_c, v_c, pos_c, m_new, l, acc)

    carry = (k_blk, v_blk, kv_pos, m0, l0, acc0)
    carry = jax.lax.fori_loop(0, n_dev, step, carry)
    _, _, _, _, l, acc = carry
    # Rows with no visible keys yet (strict-causal pad rows): l == 0.
    safe_l = jnp.where(l > 0, l, 1.0)
    ctx = acc / safe_l[..., None] - v_zero_point
    return (ctx * v_scale).astype(q.dtype)

  fn = jax.shard_map(
      local, mesh=mesh,
      in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                P(None, None, axis, None), P(axis), P(axis)),
      out_specs=P(None, None, axis, None),
      check_vma=False,
  )
  return fn(q, k_q, v_q, q_positions, kv_positions)


def reference_attention_int8(q, k_q, v_q, k_scale, v_scale, mask,
                             k_zero_point=0.0, v_zero_point=0.0):
  """Single-device XLA twin (same closed-form zp numerics) for testing."""
  qf = q.astype(jnp.float32)
  scores = _partial_stats(
      qf, k_q, k_scale, k_zero_point,
      mask if mask.ndim == 3 else mask[:, None, :])
  probs = jax.nn.softmax(scores, axis=-1)
  ctx = jnp.einsum('bnrs,bnsh->bnrh', probs, v_q.astype(jnp.float32))
  ctx = ctx - v_zero_point
  return (ctx * v_scale).astype(q.dtype)
