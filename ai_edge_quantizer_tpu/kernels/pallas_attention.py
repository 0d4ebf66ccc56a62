"""Pallas decode attention over an int8-quantized KV cache.

One kernel per (batch, kv-head): the int8 K/V cache pages stream
HBM -> VMEM once, dequantize in registers, and the whole
scores -> masked softmax -> context chain runs in VMEM — no f32 cache copy
ever exists in HBM (the executor's generic path materializes one; this
kernel is the serving fast path that makes int8 caches actually halve
attention bandwidth).

Numerics: per-tensor symmetric cache scales (k_scale, v_scale) — the scale
layout produced by the SAME_AS_OUTPUT DUS quantization with cross-signature
alignment. Masking by sequence length (decode: attend to positions
[0, length)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(len_ref, q_ref, k_ref, v_ref, scales_ref, o_ref):
  """One (batch, kv_head) program.

  q [G, H] f32; k,v [S, H] int8; scales [1, 2] f32 (k_scale, v_scale);
  len: length-1 int32 ref (scalar-prefetch slice). Output [G, H] f32.
  """
  g, h = q_ref.shape
  s = k_ref.shape[0]
  length = len_ref[0]
  k_scale = scales_ref[0, 0]
  v_scale = scales_ref[0, 1]

  k = k_ref[:].astype(jnp.float32)
  scores = jax.lax.dot_general(
      q_ref[:], k, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  ) * (k_scale / (h ** 0.5))  # [G, S]
  pos = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)
  scores = jnp.where(pos < length, scores, -1e30)
  scores = scores - jnp.max(scores, axis=1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=1, keepdims=True)
  v = v_ref[:].astype(jnp.float32)
  ctx = jax.lax.dot_general(
      probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  ) * v_scale
  o_ref[:] = ctx


@functools.partial(jax.jit, static_argnames=('interpret',))
def decode_attention_int8(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,
    interpret: bool = False,
) -> jax.Array:
  """Fused int8-cache decode attention.

  q: [B, NK, G, H] f32 (grouped queries, rope applied).
  k_cache_q/v_cache_q: [B, NK, S, H] int8.
  k_scale/v_scale: scalar f32 per-tensor cache scales.
  lengths: [B] int32 — attend to cache[:length] per row.
  Returns [B, NK, G, H] f32.
  """
  b, nk, g, h = q.shape
  s = k_cache_q.shape[2]
  q2 = q.reshape(b * nk, g, h).astype(jnp.float32)
  k2 = k_cache_q.reshape(b * nk, s, h)
  v2 = v_cache_q.reshape(b * nk, s, h)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(())]).reshape(1, 2)
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(b * nk)

  # Lengths ride as a scalar-prefetch operand: a full SMEM array indexed
  # by program id (Mosaic rejects sub-(8, 128) SMEM *blocks*).
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(b * nk,),
      in_specs=[
          pl.BlockSpec((1, g, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 2), lambda i, lens_ref: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, g, h), lambda i, lens_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
  )

  def kernel(lens_ref, q_ref, k_ref, v_ref, scales_ref, o_ref):
    _decode_attn_kernel(
        lens_ref.at[pl.ds(pl.program_id(0), 1)],
        q_ref.at[0], k_ref.at[0], v_ref.at[0], scales_ref, o_ref.at[0])

  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((b * nk, g, h), jnp.float32),
      interpret=interpret,
  )(lens, q2, k2, v2, scales)
  return out.reshape(b, nk, g, h)


def decode_attention_int8_ref(q, k_cache_q, v_cache_q, k_scale, v_scale,
                              lengths):
  """XLA reference twin (same numerics, no fusion guarantees)."""
  b, nk, g, h = q.shape
  s = k_cache_q.shape[2]
  k = k_cache_q.astype(jnp.float32) * k_scale
  v = v_cache_q.astype(jnp.float32) * v_scale
  scores = jnp.einsum('bngh,bnsh->bngs', q.astype(jnp.float32), k)
  scores = scores / (h ** 0.5)
  pos = jnp.arange(s)[None, None, None, :]
  mask = pos < lengths[:, None, None, None]
  scores = jnp.where(mask, scores, -1e30)
  probs = jax.nn.softmax(scores, axis=-1)
  return jnp.einsum('bngs,bnsh->bngh', probs, v)


def _flash_attn_kernel(q_ref, k_ref, v_ref, mask_ref, scales_ref, o_ref,
                       acc_ref, m_ref, l_ref):
  """One (batch*kv_head, q_tile, s_tile) program; S innermost.

  Online-softmax accumulation in VMEM scratch (persists across the
  sequential S grid steps): the [R, S] score matrix never materializes, so
  prefill-shaped R (= G * T) runs in bounded VMEM while the int8 K/V
  blocks stream HBM -> VMEM once.
  """
  s_idx = pl.program_id(2)
  n_s = pl.num_programs(2)
  k_scale = scales_ref[0, 0]
  v_scale = scales_ref[0, 1]
  zp_k = scales_ref[0, 2]
  zp_v = scales_ref[0, 3]

  @pl.when(s_idx == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

  q = q_ref[0].astype(jnp.float32)
  k = k_ref[0].astype(jnp.float32)
  h = q.shape[-1]
  scores = jax.lax.dot_general(
      q, k, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  )  # [br, bs]
  scores = scores - zp_k * jnp.sum(q, axis=1, keepdims=True)
  scores = scores * (k_scale / (h ** 0.5))
  scores = scores + mask_ref[0]

  m_prev = m_ref[:]
  l_prev = l_ref[:]
  m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
  alpha = jnp.exp(m_prev - m_new)
  p = jnp.exp(scores - m_new)
  l_ref[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
  m_ref[:] = m_new
  v = v_ref[0].astype(jnp.float32)
  pv = jax.lax.dot_general(
      p, v, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  acc_ref[:] = acc_ref[:] * alpha + pv

  @pl.when(s_idx == n_s - 1)
  def _():
    denom = jnp.maximum(l_ref[:], 1e-30)
    o_ref[0] = ((acc_ref[:] / denom) - zp_v) * v_scale


@functools.partial(
    jax.jit,
    static_argnames=('k_zero_point', 'v_zero_point', 'block_r', 'block_s',
                     'interpret'))
def flash_attention_int8_masked(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale,
    v_scale,
    mask: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    block_r: int = 256,
    block_s: int = 512,
    interpret: bool = False,
) -> jax.Array:
  """Prefill-shaped fused attention over an int8 KV cache.

  q: [B, NK, R, H] with R = G * T grouped query rows; caches
  [B, NK, S, H] int8 per-tensor; mask [B, 1, R, S] additive.
  Flash (S-blocked, online softmax) so R x S never materializes.
  Returns [B, NK, R, H] f32.
  """
  b, nk, r, h = q.shape
  s = k_cache_q.shape[2]
  br = min(block_r, r)
  while r % br:
    br //= 2
  bs = min(block_s, s)
  while s % bs:
    bs //= 2
  q2 = q.reshape(b * nk, r, h).astype(jnp.float32)
  k2 = k_cache_q.reshape(b * nk, s, h)
  v2 = v_cache_q.reshape(b * nk, s, h)
  m2 = jnp.broadcast_to(mask.astype(jnp.float32), (b, nk, r, s)).reshape(
      b * nk, r, s)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)

  out = pl.pallas_call(
      _flash_attn_kernel,
      grid=(b * nk, r // br, s // bs),
      in_specs=[
          pl.BlockSpec((1, br, h), lambda i, j, t: (i, j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bs, h), lambda i, j, t: (i, t, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bs, h), lambda i, j, t: (i, t, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, br, bs), lambda i, j, t: (i, j, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i, j, t: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, br, h), lambda i, j, t: (i, j, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b * nk, r, h), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((br, h), jnp.float32),
          pltpu.VMEM((br, 1), jnp.float32),
          pltpu.VMEM((br, 1), jnp.float32),
      ],
      interpret=interpret,
  )(q2, k2, v2, m2, scales)
  return out.reshape(b, nk, r, h)


def _decode_attn_mask_kernel_bf16(q_ref, k_ref, v_ref, mask_ref, scales_ref,
                                  o_ref):
  """bf16-compute variant: int8 K/V convert to bf16 (exact for int8
  values), both dots run as native bf16 MXU ops with f32 accumulators —
  half the VPU conversion traffic and 4x the MXU rate of the f32 path."""
  g, h = q_ref.shape
  k_scale = scales_ref[0, 0]
  v_scale = scales_ref[0, 1]
  zp_k = scales_ref[0, 2]
  zp_v = scales_ref[0, 3]
  q = q_ref[:]
  qb = q.astype(jnp.bfloat16)
  k = k_ref[:].astype(jnp.bfloat16)
  scores = jax.lax.dot_general(
      qb, k, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  scores = scores - zp_k * jnp.sum(q, axis=1, keepdims=True)
  scores = scores * (k_scale / (h ** 0.5))
  scores = scores + mask_ref[:]
  scores = scores - jnp.max(scores, axis=1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=1, keepdims=True)
  ctx = jax.lax.dot_general(
      probs.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  ctx = (ctx - zp_v) * v_scale
  o_ref[:] = ctx


def _decode_attn_mask_kernel_int8(q_ref, k_ref, v_ref, mask_ref, scales_ref,
                                  o_ref):
  """Full-int8 compute: q quantized per row in-kernel, probs quantized to
  7 bits; BOTH dots run int8 x int8 -> int32 on the MXU and the int8 K/V
  blocks feed the MXU with NO dtype conversion pass at all."""
  g, h = q_ref.shape
  k_scale = scales_ref[0, 0]
  v_scale = scales_ref[0, 1]
  zp_k = scales_ref[0, 2]
  zp_v = scales_ref[0, 3]
  q = q_ref[:]
  q_absmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
  q_scale = jnp.maximum(q_absmax, 1e-9) * (1.0 / 127.0)
  q_q = jnp.round(q / q_scale).astype(jnp.int8)
  acc = jax.lax.dot_general(
      q_q, k_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32,
  )
  scores = acc.astype(jnp.float32) * q_scale
  scores = scores - zp_k * jnp.sum(
      q_q.astype(jnp.float32) * q_scale, axis=1, keepdims=True)
  scores = scores * (k_scale / (h ** 0.5))
  scores = scores + mask_ref[:]
  scores = scores - jnp.max(scores, axis=1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=1, keepdims=True)
  p_q = jnp.round(probs * 127.0).astype(jnp.int8)
  ctx_acc = jax.lax.dot_general(
      p_q, v_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32,
  )
  # Renormalize by the quantized-probability row sum (not 127): rounding
  # keeps rows summing to ~127 but the exact sum preserves E[ctx].
  p_sum = jnp.maximum(
      jnp.sum(p_q.astype(jnp.float32), axis=1, keepdims=True), 1.0)
  ctx = ctx_acc.astype(jnp.float32) / p_sum
  ctx = (ctx - zp_v) * v_scale
  o_ref[:] = ctx


def _decode_attn_mask_kernel(q_ref, k_ref, v_ref, mask_ref, scales_ref,
                             o_ref):
  """Masked variant: additive mask [G, S]; asymmetric caches supported.

  Zero points enter in closed form: the K zero point shifts every score by
  zp_k * sum_h(q) (per row), and since softmax rows sum to 1, the V zero
  point shifts the context by the constant zp_v * v_scale.
  """
  g, h = q_ref.shape
  k_scale = scales_ref[0, 0]
  v_scale = scales_ref[0, 1]
  zp_k = scales_ref[0, 2]
  zp_v = scales_ref[0, 3]
  q = q_ref[:]
  k = k_ref[:].astype(jnp.float32)
  scores = jax.lax.dot_general(
      q, k, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  scores = scores - zp_k * jnp.sum(q, axis=1, keepdims=True)
  scores = scores * (k_scale / (h ** 0.5))
  scores = scores + mask_ref[:]
  scores = scores - jnp.max(scores, axis=1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=1, keepdims=True)
  ctx = jax.lax.dot_general(
      probs, v_ref[:].astype(jnp.float32),
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  ctx = (ctx - zp_v) * v_scale
  o_ref[:] = ctx


_ATTN_KERNELS = {
    'f32': _decode_attn_mask_kernel,
    'bf16': _decode_attn_mask_kernel_bf16,
    'int8': _decode_attn_mask_kernel_int8,
}


def _ctx_prefix_len(compute, q, k_ref, v_ref, length, scales_ref):
  """Per-row context over the visible prefix [0, length) -> [G, H] f32.

  Shared numerics core of the lengths-masked kernels: identical to the
  mask kernels when the additive mask is prefix-form (0 for pos <
  length, <= -1e30 after): exp underflows to exactly 0.0 in f32 either
  way, so scores/probs/context match the masked twin bit-for-bit.
  `q` is [G, H] f32 values.
  """
  g, h = q.shape
  s = k_ref.shape[0]
  k_scale = scales_ref[0, 0]
  v_scale = scales_ref[0, 1]
  zp_k = scales_ref[0, 2]
  zp_v = scales_ref[0, 3]
  pos = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)
  if compute == 'int8':
    q_absmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
    q_scale = jnp.maximum(q_absmax, 1e-9) * (1.0 / 127.0)
    q_q = jnp.round(q / q_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q_q, k_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc.astype(jnp.float32) * q_scale
    scores = scores - zp_k * jnp.sum(
        q_q.astype(jnp.float32) * q_scale, axis=1, keepdims=True)
  else:
    if compute == 'bf16':
      k = k_ref[:].astype(jnp.bfloat16)
      qd = q.astype(jnp.bfloat16)
    else:
      k = k_ref[:].astype(jnp.float32)
      qd = q
    scores = jax.lax.dot_general(
        qd, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores - zp_k * jnp.sum(q, axis=1, keepdims=True)
  scores = scores * (k_scale / (h ** 0.5))
  scores = jnp.where(pos < length, scores, -1e30)
  scores = scores - jnp.max(scores, axis=1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=1, keepdims=True)
  if compute == 'int8':
    p_q = jnp.round(probs * 127.0).astype(jnp.int8)
    ctx_acc = jax.lax.dot_general(
        p_q, v_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    p_sum = jnp.maximum(
        jnp.sum(p_q.astype(jnp.float32), axis=1, keepdims=True), 1.0)
    ctx = ctx_acc.astype(jnp.float32) / p_sum
  elif compute == 'bf16':
    ctx = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
  else:
    ctx = jax.lax.dot_general(
        probs, v_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
  return (ctx - zp_v) * v_scale


@functools.partial(
    jax.jit, static_argnames=('interpret', 'k_zero_point', 'v_zero_point',
                              'compute', 'batch_block', 'out_dtype'))
def decode_attention_int8_lengths(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    compute: str = 'f32',
    batch_block: int = 4,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
  """Batch-blocked int8-cache decode attention masked by prefix lengths.

  Same contract as decode_attention_int8_masked but visibility comes as
  per-row lengths [B] instead of an additive [B, 1, G, S] mask — the
  mask block (g*s*4 bytes per row, ~8 MB/layer at the bench shape) never
  streams from HBM. Exact twin of the masked kernel whenever the mask is
  prefix-form. out_dtype bf16 skips the downstream f32->bf16 cast pass.
  """
  b, nk, g, h = q.shape
  s = k_cache_q.shape[2]
  bn_rows = b * nk
  bb = max(1, batch_block)
  while bn_rows % bb:
    bb //= 2
  # VMEM clamp (no mask block to budget for, just double-buffered K/V).
  while bb > 1 and 2 * (2 * bb * s * h) + 8 * s * h > 14 * 2**20:
    bb //= 2
  q2 = q.reshape(bn_rows, g, h).astype(jnp.float32)
  k2 = k_cache_q.reshape(bn_rows, s, h)
  v2 = v_cache_q.reshape(bn_rows, s, h)
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(bn_rows)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)

  def kernel(lens_ref, q_ref, k_ref, v_ref, scales_ref, o_ref):
    row0 = pl.program_id(0) * bb
    for row in range(bb):
      ctx = _ctx_prefix_len(
          compute, q_ref[row], k_ref.at[row], v_ref.at[row],
          lens_ref[row0 + row], scales_ref)
      o_ref[row] = ctx.astype(o_ref.dtype)

  # Lengths ride as a scalar-prefetch operand: a full SMEM array indexed
  # by program id (Mosaic rejects sub-(8, 128) SMEM *blocks*).
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(bn_rows // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i, lens_ref: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
  )
  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((bn_rows, g, h), out_dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      cost_estimate=pl.CostEstimate(
          flops=4 * bn_rows * g * s * h,
          bytes_accessed=2 * bn_rows * s * h,
          transcendentals=bn_rows * g * s),
      interpret=interpret,
  )(lens, q2, k2, v2, scales)
  return out.reshape(b, nk, g, h)


def _ctx_prefix_len_cur(compute, q, k, v, k_cur, v_cur, length_stale,
                        scales_ref):
  """Prefix-length context PLUS one current-token column -> [G, H] f32.

  Exactly softmax over [cache rows < length_stale, current token]: the
  math of attention over a cache whose row `pos` was just written with
  (k_cur, v_cur) and lengths = length_stale + 1, but WITHOUT reading the
  written row — the caller feeds the stale (pre-write) cache, so the
  cache write leaves the attention critical path. f32/bf16 compute.
  """
  g, h = q.shape
  s = k.shape[0]
  k_scale = scales_ref[0, 0]
  v_scale = scales_ref[0, 1]
  zp_k = scales_ref[0, 2]
  zp_v = scales_ref[0, 3]
  pos = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)
  if compute == 'int8':
    # Integer path: per-row q quantization; both dots int8 x int8 on the
    # MXU. Integer adds are associative, so the inline current column is
    # EXACTLY the splice twin's result.
    q_absmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
    q_scale = jnp.maximum(q_absmax, 1e-9) * (1.0 / 127.0)
    q_q = jnp.round(q / q_scale).astype(jnp.int8)
    qf_sum = jnp.sum(q_q.astype(jnp.float32) * q_scale, axis=1,
                     keepdims=True)
    scores = jax.lax.dot_general(
        q_q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * q_scale
    scores = (scores - zp_k * qf_sum) * (k_scale / (h ** 0.5))
    scores = jnp.where(pos < length_stale, scores, -1e30)
    s_cur = jax.lax.dot_general(
        q_q, k_cur, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * q_scale
    s_cur = (s_cur - zp_k * qf_sum) * (k_scale / (h ** 0.5))
    m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), s_cur)
    p = jnp.exp(scores - m)
    p_cur = jnp.exp(s_cur - m)
    denom = jnp.sum(p, axis=1, keepdims=True) + p_cur
    p_q = jnp.round(p / denom * 127.0).astype(jnp.int8)
    p_cur_q = jnp.round(p_cur / denom * 127.0).astype(jnp.int8)
    ctx_acc = jax.lax.dot_general(
        p_q, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    ctx_acc += (p_cur_q.astype(jnp.int32)
                * v_cur.astype(jnp.int32).reshape(1, h))
    p_sum = jnp.maximum(
        jnp.sum(p_q.astype(jnp.float32), axis=1, keepdims=True)
        + p_cur_q.astype(jnp.float32), 1.0)
    ctx = ctx_acc.astype(jnp.float32) / p_sum
    return (ctx - zp_v) * v_scale
  if compute == 'bf16':
    kd = k.astype(jnp.bfloat16)
    kcd = k_cur.astype(jnp.bfloat16)
    qd = q.astype(jnp.bfloat16)
  else:
    kd = k.astype(jnp.float32)
    kcd = k_cur.astype(jnp.float32)
    qd = q
  q_sum = jnp.sum(q, axis=1, keepdims=True)
  scores = jax.lax.dot_general(
      qd, kd, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  scores = (scores - zp_k * q_sum) * (k_scale / (h ** 0.5))
  scores = jnp.where(pos < length_stale, scores, -1e30)
  s_cur = jax.lax.dot_general(
      qd, kcd, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)  # [G, 1]
  s_cur = (s_cur - zp_k * q_sum) * (k_scale / (h ** 0.5))
  m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), s_cur)
  p = jnp.exp(scores - m)
  p_cur = jnp.exp(s_cur - m)
  denom = jnp.sum(p, axis=1, keepdims=True) + p_cur
  probs = p / denom
  probs_cur = p_cur / denom
  if compute == 'bf16':
    # Match the lengths twin's order: normalize in f32, THEN cast the
    # probabilities to bf16 for the value contraction.
    pv = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pv_cur = (probs_cur.astype(jnp.bfloat16).astype(jnp.float32)
              * v_cur.astype(jnp.float32).reshape(1, h))
  else:
    pv = jax.lax.dot_general(
        probs, v.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pv_cur = probs_cur * v_cur.astype(jnp.float32).reshape(1, h)
  ctx = pv + pv_cur
  return (ctx - zp_v) * v_scale


@functools.partial(
    jax.jit, static_argnames=('interpret', 'k_zero_point', 'v_zero_point',
                              'compute', 'batch_block', 'out_dtype'))
def decode_attention_int8_lengths_stale(
    q: jax.Array,
    k_cache_stale: jax.Array,
    v_cache_stale: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,
    k_new_q: jax.Array,
    v_new_q: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    compute: str = 'f32',
    batch_block: int = 4,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
  """Decode attention over the PRE-WRITE cache + inline current token.

  Numerically the attention of `decode_attention_int8_lengths` over the
  cache with row (lengths-1) updated to (k_new_q, v_new_q) — but the
  kernel never reads the written row, so the per-layer cache DUS no
  longer gates the attention's cache DMA (the write ran ~64 us/layer of
  pipeline stall when the attention consumed its output: skipping half
  the writes saved 1.15 ms/step at the bench shape). `lengths` counts
  the current token, exactly like the mask-derived lengths.
  """
  b, nk, g, h = q.shape
  s = k_cache_stale.shape[2]
  bn_rows = b * nk
  bb = max(1, batch_block)
  while bn_rows % bb:
    bb //= 2
  while bb > 1 and 2 * (2 * bb * s * h) + 8 * s * h > 14 * 2**20:
    bb //= 2
  q2 = q.reshape(bn_rows, g, h).astype(jnp.float32)
  k2 = k_cache_stale.reshape(bn_rows, s, h)
  v2 = v_cache_stale.reshape(bn_rows, s, h)
  kn = k_new_q.reshape(bn_rows, 1, h)
  vn = v_new_q.reshape(bn_rows, 1, h)
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(bn_rows)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)

  def kernel(lens_ref, q_ref, k_ref, v_ref, kn_ref, vn_ref, scales_ref,
             o_ref):
    row0 = pl.program_id(0) * bb
    for row in range(bb):
      ctx = _ctx_prefix_len_cur(
          compute, q_ref[row], k_ref[row], v_ref[row], kn_ref[row],
          vn_ref[row], lens_ref[row0 + row] - 1, scales_ref)
      o_ref[row] = ctx.astype(o_ref.dtype)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(bn_rows // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, 1, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, 1, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i, lens_ref: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
  )
  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((bn_rows, g, h), out_dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      cost_estimate=pl.CostEstimate(
          flops=4 * bn_rows * g * s * h,
          bytes_accessed=2 * bn_rows * s * h,
          transcendentals=bn_rows * g * s),
      interpret=interpret,
  )(lens, q2, k2, v2, kn, vn, scales)
  return out.reshape(b, nk, g, h)


@functools.partial(
    jax.jit, static_argnames=('interpret', 'k_zero_point', 'v_zero_point',
                              'compute', 'batch_block', 'out_dtype'))
def decode_attention_int8_lengths_writeback(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,
    k_new_q: jax.Array,
    v_new_q: jax.Array,
    pos: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    compute: str = 'f32',
    batch_block: int = 4,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
  """Lengths-masked decode attention that ALSO persists the new KV row.

  Exactly `decode_attention_int8_lengths` over the cache with row `pos`
  replaced by (k_new_q, v_new_q), plus the two cache DUS writes folded
  into this one dispatch: the new row is spliced into the VMEM cache
  blocks with an iota select (no dynamic slicing — Mosaic lacks it), and
  the dirty 32-row tile is written back through blocked outputs whose
  index map reads `pos` from a prefetch scalar; the cache outputs alias
  the cache inputs, so untouched tiles keep their input bytes. Each
  separate cache-update dispatch cost ~36 us of per-dispatch overhead at
  the bench shape (1.5 ms/step for 36 of them — AEQT_SKIP_CACHE_WRITE
  A/B, docs/ROUND2_NOTES.md); this removes all of them.

  q [B, NK, G, H]; caches [B, NK, S, H] int8; k_new_q/v_new_q
  [B, NK, 1, H] int8 (already quantized at the cache scale); pos scalar
  int32 (same row for every batch row — the graph's shared cache_pos);
  lengths [B] must already count the new row. Returns
  (ctx [B, NK, G, H] out_dtype, k_cache_out, v_cache_out int8).
  """
  b, nk, g, h = q.shape
  s = k_cache_q.shape[2]
  tile = 32  # int8 sublane tile: HBM writes must cover full tiles
  if s % tile:
    raise ValueError(f'cache length {s} must be a multiple of {tile}.')
  bn_rows = b * nk
  bb = max(1, batch_block)
  while bn_rows % bb:
    bb //= 2
  while bb > 1 and 2 * (2 * bb * s * h) + 8 * s * h > 14 * 2**20:
    bb //= 2
  q2 = q.reshape(bn_rows, g, h).astype(jnp.float32)
  k2 = k_cache_q.reshape(bn_rows, s, h)
  v2 = v_cache_q.reshape(bn_rows, s, h)
  kn = k_new_q.reshape(bn_rows, 1, h)
  vn = v_new_q.reshape(bn_rows, 1, h)
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(bn_rows)
  pos_arr = jnp.clip(
      jnp.asarray(pos, jnp.int32).reshape(1), 0, s - 1)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)

  def kernel(lens_ref, pos_ref, q_ref, k_ref, v_ref,
             kn_ref, vn_ref, scales_ref, o_ref, ko_ref, vo_ref):
    row0 = pl.program_id(0) * bb
    p = pos_ref[0]
    t0 = (p // tile) * tile
    # Persist the dirty tile through the blocked (pos-indexed) aliased
    # output. The original tile bytes are gathered from the full VMEM
    # cache block with a one-hot dot (exact for int8 values; Mosaic has
    # no dynamic slicing) — passing the cache a second time as a tile
    # view would force XLA to copy the whole donated cache.
    trow = jax.lax.broadcasted_iota(jnp.int32, (bb, tile, h), 1)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (tile, s), 0) + t0
              == jax.lax.broadcasted_iota(jnp.int32, (tile, s), 1)
              ).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (s, h), 0)
    ktiles = []
    vtiles = []
    for row in range(bb):
      ktiles.append(jax.lax.dot_general(
          onehot, k_ref[row].astype(jnp.float32),
          dimension_numbers=(((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32).astype(k_ref.dtype))
      vtiles.append(jax.lax.dot_general(
          onehot, v_ref[row].astype(jnp.float32),
          dimension_numbers=(((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32).astype(v_ref.dtype))
    ktile = jnp.stack(ktiles, axis=0)
    vtile = jnp.stack(vtiles, axis=0)
    ko_ref[...] = jnp.where(trow == (p - t0),
                            jnp.broadcast_to(kn_ref[...], (bb, tile, h)),
                            ktile)
    vo_ref[...] = jnp.where(trow == (p - t0),
                            jnp.broadcast_to(vn_ref[...], (bb, tile, h)),
                            vtile)
    # Attention over the spliced cache (values, not refs: `[:]` on an
    # array is the array, so _ctx_prefix_len consumes either).
    for row in range(bb):
      k_spl = jnp.where(srow == p, jnp.broadcast_to(kn_ref[row], (s, h)),
                        k_ref[row])
      v_spl = jnp.where(srow == p, jnp.broadcast_to(vn_ref[row], (s, h)),
                        v_ref[row])
      ctx = _ctx_prefix_len(
          compute, q_ref[row], k_spl, v_spl, lens_ref[row0 + row],
          scales_ref)
      o_ref[row] = ctx.astype(o_ref.dtype)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(bn_rows // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i, lens_ref, pos_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref, pos_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref, pos_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, 1, h), lambda i, lens_ref, pos_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, 1, h), lambda i, lens_ref, pos_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i, lens_ref, pos_ref: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((bb, g, h), lambda i, lens_ref, pos_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(
              (bb, tile, h),
              lambda i, lens_ref, pos_ref: (i, pos_ref[0] // tile, 0),
              memory_space=pltpu.VMEM),
          pl.BlockSpec(
              (bb, tile, h),
              lambda i, lens_ref, pos_ref: (i, pos_ref[0] // tile, 0),
              memory_space=pltpu.VMEM),
      ],
  )
  ctx, k_out, v_out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((bn_rows, g, h), out_dtype),
          jax.ShapeDtypeStruct((bn_rows, s, h), k2.dtype),
          jax.ShapeDtypeStruct((bn_rows, s, h), v2.dtype),
      ],
      # Inputs count the 2 scalar-prefetch operands: q2 is 2, k2 is 3,
      # v2 is 4. The cache outputs alias the cache inputs so untouched
      # tiles keep their input bytes.
      input_output_aliases={3: 1, 4: 2},
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      interpret=interpret,
  )(lens, pos_arr, q2, k2, v2, kn, vn, scales)
  return (ctx.reshape(b, nk, g, h),
          k_out.reshape(b, nk, s, h), v_out.reshape(b, nk, s, h))


@functools.partial(
    jax.jit,
    static_argnames=('k_zero_point', 'v_zero_point', 'chunk', 'row_block',
                     'interpret'))
def decode_attention_int8_dynlen(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale,
    v_scale,
    lengths: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    chunk: int = 256,
    row_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
  """Decode attention reading ONLY the live cache prefix per row.

  The static-shape answer to paged attention: K/V stay in HBM; the kernel
  double-buffer-DMAs `chunk`-position windows for a block of `row_block`
  (batch, kv-head) rows at once and STOPS at ceil(max_live/chunk) for the
  block, so a conversation at position P streams ~P positions instead of
  the whole allocated S (a 256-token chat reads 4x less cache than S=1024
  would). Row-blocking keeps each DMA large (row_block*chunk*H bytes) and
  the grid short — the single-row variant was DMA-latency-bound at short
  lengths (1 chunk/row = zero double-buffering overlap). Online softmax
  across chunks; rows are masked to their own [0, length).

  q [B, NK, G, H]; caches [B, NK, S, H] int8 per-tensor scale;
  lengths [B] int32 (attend to cache[:length] per batch row).
  Returns [B, NK, G, H] f32.
  """
  b, nk, g, h = q.shape
  s = k_cache_q.shape[2]
  c = min(chunk, s)
  while s % c:
    c //= 2
  n_rows = b * nk
  rb = max(1, min(row_block, n_rows))
  while n_rows % rb:
    rb //= 2
  # VMEM guard: 2 slots x 2 caches x rb*c*h int8 must stay well under the
  # 16 MB Mosaic scoped limit (plus accumulators).
  while rb > 1 and 4 * rb * c * h > 8 * 2**20:
    rb //= 2
  q2 = q.reshape(n_rows, g, h).astype(jnp.float32)
  k2 = k_cache_q.reshape(n_rows, s, h)
  v2 = v_cache_q.reshape(n_rows, s, h)
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(n_rows)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)
  max_chunks = s // c

  def kernel(lens_ref, q_ref, scales_ref, k_hbm, v_hbm, o_ref):
    i = pl.program_id(0)
    row0 = i * rb
    # Per-row live lengths for this block (SMEM scalar reads, unrolled).
    lens_blk = [lens_ref[row0 + j] for j in range(rb)]
    blk_len = functools.reduce(jnp.maximum, lens_blk)
    n_chunks = jnp.clip(pl.cdiv(blk_len, c), 1, max_chunks)
    k_scale_ = scales_ref[0, 0]
    v_scale_ = scales_ref[0, 1]
    zp_k = scales_ref[0, 2]
    zp_v = scales_ref[0, 3]
    q_blk = q_ref[:]  # [rb, G, H] f32

    def body(k_buf, v_buf, sem):
      def dma(slot, ci, hbm, buf):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(row0, rb), pl.ds(ci * c, c)], buf.at[slot],
            sem.at[slot if hbm is k_hbm else slot + 2])

      dma(0, 0, k_hbm, k_buf).start()
      dma(0, 0, v_hbm, v_buf).start()

      def loop(ci, carry):
        slot = ci % 2
        nxt = (ci + 1) % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
          dma(nxt, ci + 1, k_hbm, k_buf).start()
          dma(nxt, ci + 1, v_hbm, v_buf).start()

        dma(slot, ci, k_hbm, k_buf).wait()
        dma(slot, ci, v_hbm, v_buf).wait()
        # Per-row dots, unrolled: Mosaic has no batched dot_general, and
        # this mirrors the (compiling) masked kernel's structure.
        new_carry = []
        for j in range(rb):
          m_prev, l_prev, acc = carry[j]
          k_c = k_buf[slot, j].astype(jnp.float32)  # [c, H]
          scores = jax.lax.dot_general(
              q_blk[j], k_c, dimension_numbers=(((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32,
          )  # [G, c]
          scores = scores - zp_k * jnp.sum(q_blk[j], axis=1, keepdims=True)
          scores = scores * (k_scale_ / (h ** 0.5))
          pos = ci * c + jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
          scores = jnp.where(pos < lens_blk[j], scores, -1e30)
          m_new = jnp.maximum(
              m_prev, jnp.max(scores, axis=1, keepdims=True))
          alpha = jnp.exp(m_prev - m_new)
          p = jnp.exp(scores - m_new)
          l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
          v_c = v_buf[slot, j].astype(jnp.float32)  # [c, H]
          pv = jax.lax.dot_general(
              p, v_c, dimension_numbers=(((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32,
          )
          new_carry.append((m_new, l_new, acc * alpha + pv))
        return tuple(new_carry)

      init = tuple(
          (jnp.full((g, 1), -1e30, jnp.float32),
           jnp.zeros((g, 1), jnp.float32),
           jnp.zeros((g, h), jnp.float32)) for _ in range(rb))
      fin = jax.lax.fori_loop(0, n_chunks, loop, init)
      for j in range(rb):
        _, l_fin, acc_fin = fin[j]
        denom = jnp.maximum(l_fin, 1e-30)
        o_ref[j] = ((acc_fin / denom) - zp_v) * v_scale_

    pl.run_scoped(
        body,
        pltpu.VMEM((2, rb, c, h), jnp.int8),
        pltpu.VMEM((2, rb, c, h), jnp.int8),
        pltpu.SemaphoreType.DMA((4,)),
    )

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(n_rows // rb,),
      in_specs=[
          pl.BlockSpec((rb, g, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i, lens_ref: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec((rb, g, h), lambda i, lens_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
  )
  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n_rows, g, h), jnp.float32),
      interpret=interpret,
  )(lens, q2, scales, k2, v2)
  return out.reshape(b, nk, g, h)


@functools.partial(
    jax.jit, static_argnames=('interpret', 'k_zero_point', 'v_zero_point',
                              'compute', 'batch_block'))
def decode_attention_int8_masked(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    mask: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    compute: str = 'f32',
    batch_block: int = 1,
    interpret: bool = False,
) -> jax.Array:
  """Fused int8-cache attention with an additive mask (graph semantics).

  q: [B, NK, G, H]; caches: [B, NK, S, H] int8 (per-tensor scale +
  optional zero point); mask: [B, 1, G, S] additive (0 = visible).
  Returns [B, NK, G, H] f32.

  compute: 'f32' (exact twin of the XLA path), 'bf16' (int8->bf16 K/V,
  bf16 MXU dots), or 'int8' (q and probs quantized in-kernel, both dots
  int8 x int8 -> int32 with no K/V conversion pass — fastest, with a
  bounded ~1/254 probability-rounding error).
  batch_block: (batch * kv_head) rows processed per grid program —
  amortizes per-program pipeline overhead across rows.
  """
  b, nk, g, h = q.shape
  s = k_cache_q.shape[2]
  bn_rows = b * nk
  bb = max(1, batch_block)
  while bn_rows % bb:
    bb //= 2
  # VMEM clamp: double-buffered int8 K/V blocks + f32 mask block + per-row
  # f32 conversion temps must stay under the ~16 MB Mosaic scoped limit
  # (bb=16 at S=1024 H=256 fails to compile; bb<=8 fits).
  while bb > 1 and 2 * (2 * bb * s * h + bb * g * s * 4) + 8 * s * h > \
      14 * 2**20:
    bb //= 2
  q2 = q.reshape(bn_rows, g, h).astype(jnp.float32)
  k2 = k_cache_q.reshape(bn_rows, s, h)
  v2 = v_cache_q.reshape(bn_rows, s, h)
  m2 = jnp.broadcast_to(mask.astype(jnp.float32), (b, nk, g, s)).reshape(
      bn_rows, g, s)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)
  inner = _ATTN_KERNELS[compute]

  def kernel(q_ref, k_ref, v_ref, m_ref, scales_ref, o_ref):
    for row in range(bb):
      inner(q_ref.at[row], k_ref.at[row], v_ref.at[row], m_ref.at[row],
            scales_ref, o_ref.at[row])

  out = pl.pallas_call(
      kernel,
      grid=(bn_rows // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, g, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, g, h), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((bn_rows, g, h), jnp.float32),
      # Row blocks are independent: declaring the grid parallel lets
      # Mosaic double-buffer across steps without revisiting guards, and
      # the cost estimate tells XLA this call is HBM-bound (schedules
      # surrounding FCs to overlap it).
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      cost_estimate=pl.CostEstimate(
          flops=4 * bn_rows * g * s * h,
          bytes_accessed=2 * bn_rows * s * h + 4 * bn_rows * g * s,
          transcendentals=bn_rows * g * s),
      interpret=interpret,
  )(q2, k2, v2, m2, scales)
  return out.reshape(b, nk, g, h)


def _attn_oproj_kernel(bb, g, h, d, compute, drq, cast_dt,
                       len_ref, q_ref, k_ref, v_ref, x_ref, wo_ref,
                       scales_ref, so_ref, y_ref, ctx_ref):
  """One batch block: per-row prefix attention -> out-proj -> residual.

  ctx rows are staged in VMEM scratch at the activation dtype (the
  boundary where the unfused executor stored the ctx tensor), then the
  packed-int4 out projection runs per nibble-pair head block and the
  residual add happens in-register — the [B, G*H] ctx tensor and the
  [B, D] projection output never reach HBM.
  """
  row0 = pl.program_id(0) * bb
  for j in range(bb):
    ctx = _ctx_prefix_len(compute, q_ref[j].astype(jnp.float32),
                          k_ref.at[j], v_ref.at[j], len_ref[row0 + j],
                          scales_ref)
    ctx_ref[j] = ctx.astype(cast_dt)

  pairs = g // 2
  if drq:
    # Per-row activation quantization over the full [G*H] ctx row —
    # identical xs/xq to the unfused packed-FC DRQ kernel.
    xs_rows = []
    for j in range(bb):
      cf = ctx_ref[j].astype(jnp.float32)
      absmax = jnp.max(jnp.abs(cf))
      xs_rows.append(jnp.full((1, 1), jnp.maximum(absmax, 1e-9)
                              * (1.0 / 127.0), jnp.float32))
    xs = jnp.concatenate(xs_rows, axis=0)  # [bb, 1]
    acc = jnp.zeros((bb, d), jnp.int32)
    for p in range(pairs):
      w32 = wo_ref[:, p * h:(p + 1) * h].astype(jnp.int32)
      lo = (((w32 & 0xF) ^ 8) - 8).astype(jnp.int8)
      hi = (((w32 >> 4) ^ 8) - 8).astype(jnp.int8)
      for head, wn in ((p, lo), (p + pairs, hi)):
        cfh = ctx_ref[:, head, :].astype(jnp.float32)
        xq = jnp.round(cfh * pl.reciprocal(xs, approx=False)).astype(
            jnp.int8)
        acc += jax.lax.dot_general(
            xq, wn, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    o = acc.astype(jnp.float32) * xs * so_ref[:]
  else:
    acc = jnp.zeros((bb, d), jnp.float32)
    for p in range(pairs):
      w32 = wo_ref[:, p * h:(p + 1) * h].astype(jnp.int32)
      lo = (((w32 & 0xF) ^ 8) - 8).astype(cast_dt)
      hi = (((w32 >> 4) ^ 8) - 8).astype(cast_dt)
      for head, wn in ((p, lo), (p + pairs, hi)):
        acc += jax.lax.dot_general(
            ctx_ref[:, head, :], wn,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    o = acc * so_ref[:]
  y_ref[:] = x_ref[:] + o.astype(cast_dt)


@functools.partial(
    jax.jit, static_argnames=('k_zero_point', 'v_zero_point', 'compute',
                              'batch_block', 'drq', 'interpret'))
def decode_attention_oproj_pallas(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale,
    v_scale,
    lengths: jax.Array,
    x_res: jax.Array,
    wo_packed: jax.Array,
    so: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    compute: str = 'f32',
    batch_block: int = 4,
    drq: bool = True,
    interpret: bool = False,
) -> jax.Array:
  """Prefix-length attention + packed-int4 out projection + residual.

  q [B, 1, G, H] (MQA: NK == 1), caches [B, 1, S, H] int8 per-tensor;
  lengths [B] int32; x_res [B, D] residual-stream input; wo_packed
  [D, (G*H)//2] uint8 split-half packed int4; so [D] f32 per-channel.
  Returns [B, D] in x_res.dtype: x_res + W_o @ attn(q, cache).
  Requires even G and H a lane multiple. Numerics: the attention matches
  decode_attention_int8_lengths; the projection matches the unfused
  packed-int4 FC (DRQ or weight-only) with the ctx staged at the
  activation dtype; the residual add happens at that dtype.
  """
  b, nk, g, h = q.shape
  if nk != 1:
    raise ValueError('out-proj epilogue supports MQA (NK == 1) only.')
  if g % 2:
    raise ValueError('even head count required (nibble pairing).')
  s = k_cache_q.shape[2]
  d = wo_packed.shape[0]
  cast_dt = jnp.bfloat16 if x_res.dtype == jnp.bfloat16 else jnp.float32
  # The 2D (bb, D) residual/output blocks need sublane-aligned rows
  # (Mosaic: second-to-last block dim % 8 == 0, or the full array dim),
  # so legal bb values are multiples of 8 dividing b, or b itself. Pick
  # the largest legal value <= batch_block that fits the VMEM budget;
  # raise (caller falls back to the unfused path) when none fits.
  def _fits(bb):
    return 2 * (2 * bb * s * h) + wo_packed.size <= 13 * 2**20

  legal = [v for v in range(8, b + 1, 8) if b % v == 0] or [b]
  if b not in legal:
    legal.append(b)
  candidates = [v for v in sorted(legal) if _fits(v)]
  if not candidates:
    raise ValueError(
        f'decode_attention_oproj_pallas: no sublane-legal batch block '
        f'fits VMEM at B={b}, S={s}, H={h} (cache blocks '
        f'{2 * (2 * 8 * s * h) / 2**20:.1f} MiB at bb=8).')
  bb = max([v for v in candidates if v <= max(8, batch_block)],
           default=candidates[0])
  q2 = q.reshape(b, g, h).astype(cast_dt)
  k2 = k_cache_q.reshape(b, s, h)
  v2 = v_cache_q.reshape(b, s, h)
  lens = lengths.astype(jnp.int32).reshape(b)
  x2 = x_res.reshape(b, d).astype(cast_dt)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)

  # Lengths ride as a scalar-prefetch operand: a full SMEM array indexed
  # by program id (Mosaic rejects sub-(8, 128) SMEM *blocks*).
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(b // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, d), lambda i, lens_ref: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((d, g * h // 2), lambda i, lens_ref: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i, lens_ref: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, d), lambda i, lens_ref: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, d), lambda i, lens_ref: (i, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=[pltpu.VMEM((bb, g, h), cast_dt)],
  )
  out = pl.pallas_call(
      functools.partial(_attn_oproj_kernel, bb, g, h, d, compute, drq,
                        cast_dt),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((b, d), cast_dt),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      cost_estimate=pl.CostEstimate(
          flops=4 * b * g * s * h + 2 * b * g * h * d,
          bytes_accessed=2 * b * s * h + b * d * 4 + d * g * h // 2,
          transcendentals=b * g * s),
      interpret=interpret,
  )(lens, q2, k2, v2, x2, wo_packed, scales,
    so.astype(jnp.float32).reshape(1, d))
  return out.reshape(x_res.shape).astype(x_res.dtype)


# ---------------------------------------------------------------------------
# int4 KV cache with per-token (per-written-row) dynamic scales.
#
# Packed layout: uint8 [B, NK, S, H//2], split-half along H (byte j holds
# h=j in the low nibble, h=j+H/2 in the high nibble — same scheme as
# pallas_qmatmul.pack_int4_split, so unpack is two mask/shift ops and the
# two half-matrices contract against the matching halves of q).
# Scales: bf16 [B, NK, 8, S]; sublane 0 = K row scales, sublane 1 = V row
# scales, sublanes 2-7 pad to the f32/bf16 tile (the 8-row pad costs ~6%
# of the bytes the int4 packing saves).
#
# Numerics: K_s = nib_K(s) * kscale_s, so scores[:, s] scale by kscale_s
# AFTER the integer-valued dot; V_s likewise, so probs scale by vscale_s
# BEFORE the context dot (exact linear algebra, no approximation beyond
# the int4 grid itself).
# ---------------------------------------------------------------------------


def pack_int4_rows(x_q: jax.Array) -> jax.Array:
  """int8 int4-valued [..., H] -> uint8 [..., H//2] (split-half on H)."""
  h = x_q.shape[-1]
  lo = x_q[..., : h // 2].astype(jnp.uint8) & 0xF
  hi = x_q[..., h // 2:].astype(jnp.uint8) & 0xF
  return lo | (hi << 4)


def unpack_int4_rows(packed: jax.Array) -> jax.Array:
  """Inverse of pack_int4_rows: uint8 [..., H//2] -> int8 [..., H]."""
  w32 = packed.astype(jnp.int32)
  lo = (((w32 & 0xF) ^ 8) - 8).astype(jnp.int8)
  hi = (((w32 >> 4) ^ 8) - 8).astype(jnp.int8)
  return jnp.concatenate([lo, hi], axis=-1)


def quantize_kv_rows_int4(x: jax.Array):
  """Per-row (last-dim) dynamic int4 quantization of K/V rows.

  x [..., H] float -> (packed uint8 [..., H//2], scale f32 [...]).
  """
  absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
  scale = jnp.maximum(absmax, 1e-9) * (1.0 / 7.0)
  q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
               -8, 7).astype(jnp.int8)
  return pack_int4_rows(q), scale


def _ctx_prefix_len_int4(q, kp_ref, vp_ref, sc_ref, length):
  """Per-row context over [0, length) with int4 packed K/V + row scales.

  q: [G, H] f32 values. kp_ref/vp_ref: [S, H/2] uint8 refs.
  sc_ref: [8, S] bf16 ref (row 0 = kscale, row 1 = vscale).
  """
  g, h = q.shape
  s = kp_ref.shape[0]
  h2 = h // 2
  pos = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)
  qb = q.astype(jnp.bfloat16)
  # Pure-i32 unpack: measured FASTER than mixed 8-bit/i32 on TPU (4.83
  # vs 5.51 ms chained x18) — Mosaic schedules the widened ops better,
  # and i8 vector sub/shift don't legalize at all.
  k32 = kp_ref[:].astype(jnp.int32)
  klo = (((k32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)   # [S, H/2]
  khi = (((k32 >> 4) ^ 8) - 8).astype(jnp.bfloat16)
  scores = jax.lax.dot_general(
      qb[:, :h2], klo, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  scores += jax.lax.dot_general(
      qb[:, h2:], khi, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  kscale = sc_ref[0:1, :].astype(jnp.float32)          # [1, S]
  scores = scores * kscale * (1.0 / (h ** 0.5))
  scores = jnp.where(pos < length, scores, -1e30)
  scores = scores - jnp.max(scores, axis=1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=1, keepdims=True)
  vscale = sc_ref[1:2, :].astype(jnp.float32)
  pv = (probs * vscale).astype(jnp.bfloat16)           # [G, S]
  v32 = vp_ref[:].astype(jnp.int32)
  vlo = (((v32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
  vhi = (((v32 >> 4) ^ 8) - 8).astype(jnp.bfloat16)
  ctx_lo = jax.lax.dot_general(
      pv, vlo, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  ctx_hi = jax.lax.dot_general(
      pv, vhi, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  return jnp.concatenate([ctx_lo, ctx_hi], axis=1)     # [G, H]


@functools.partial(
    jax.jit, static_argnames=('batch_block', 'out_dtype', 'interpret'))
def decode_attention_int4_lengths(
    q: jax.Array,
    k_packed: jax.Array,
    v_packed: jax.Array,
    kv_scales: jax.Array,
    lengths: jax.Array,
    batch_block: int = 4,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
  """Decode attention over an int4-packed KV cache with per-token scales.

  q [B, NK, G, H] float; k_packed/v_packed [B, NK, S, H//2] uint8;
  kv_scales [B, NK, 8, S] bf16 (sublane 0 = K scales, 1 = V scales);
  lengths [B] int32 visible-prefix lengths. Streams HALF the int8 path's
  cache bytes — the decode step's dominant HBM traffic.
  """
  b, nk, g, h = q.shape
  s = k_packed.shape[2]
  h2 = h // 2
  bn_rows = b * nk
  bb = max(1, batch_block)
  while bn_rows % bb:
    bb //= 2
  # VMEM: two double-buffered packed streams + the scale rows.
  while bb > 1 and 2 * (2 * bb * s * h2) + 2 * bb * 8 * s > 14 * 2**20:
    bb //= 2
  q2 = q.reshape(bn_rows, g, h).astype(jnp.float32)
  k2 = k_packed.reshape(bn_rows, s, h2)
  v2 = v_packed.reshape(bn_rows, s, h2)
  sc2 = kv_scales.reshape(bn_rows, 8, s).astype(jnp.bfloat16)
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(bn_rows)

  def kernel(lens_ref, q_ref, kp_ref, vp_ref, sc_ref, o_ref):
    row0 = pl.program_id(0) * bb
    for row in range(bb):
      ctx = _ctx_prefix_len_int4(
          q_ref[row], kp_ref.at[row], vp_ref.at[row], sc_ref.at[row],
          lens_ref[row0 + row])
      o_ref[row] = ctx.astype(o_ref.dtype)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(bn_rows // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h2), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h2), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, 8, s), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
  )
  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((bn_rows, g, h), out_dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      cost_estimate=pl.CostEstimate(
          flops=4 * bn_rows * g * s * h,
          bytes_accessed=bn_rows * s * (h + 2 * 2),
          transcendentals=bn_rows * g * s),
      interpret=interpret,
  )(lens, q2, k2, v2, sc2)
  return out.reshape(b, nk, g, h)


def decode_attention_int4_ref(q, k_packed, v_packed, kv_scales, lengths):
  """XLA twin of decode_attention_int4_lengths (tests + validation)."""
  b, nk, g, h = q.shape
  s = k_packed.shape[2]
  kq = unpack_int4_rows(k_packed).astype(jnp.float32)   # [B, NK, S, H]
  vq = unpack_int4_rows(v_packed).astype(jnp.float32)
  ks = kv_scales[:, :, 0, :].astype(jnp.float32)        # [B, NK, S]
  vs = kv_scales[:, :, 1, :].astype(jnp.float32)
  k = kq * ks[..., None]
  v = vq * vs[..., None]
  scores = jnp.einsum('bngh,bnsh->bngs', q.astype(jnp.float32), k)
  scores = scores / (h ** 0.5)
  pos = jnp.arange(s)[None, None, None, :]
  scores = jnp.where(pos < lengths[:, None, None, None], scores, -1e30)
  scores = scores - jnp.max(scores, axis=-1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
  return jnp.einsum('bngs,bnsh->bngh', probs, v)


# ---------------------------------------------------------------------------
# int4 KV cache, per-GROUP scales (VERDICT r3 item 8).
#
# The per-row int4 scheme above loses ~0.05 nats delta-NLL on trained-LM
# eval (KV_QUALITY_r03) because one scale per row lets a single outlier
# dim crush 255 others onto the 16-level grid. Per-group-16 sidecars fix
# the granularity, and K additionally quantizes ASYMMETRICALLY: post-RoPE
# K rows are strongly non-zero-centered, so an asymmetric grid spends all
# 16 levels on the observed span (scripts/kv_quality_eval.py
# int4_g16_asymk measures the end-quality gain).
#
# Layout: codes stay split-half packed like the per-row scheme. Sidecar
# [B, NK, SC, S] bf16 with SC = 3 * (H // group):
#   rows [0,                 ngroups)   K scale per group
#   rows [ngroups,       2 * ngroups)   K min   per group (asym offset)
#   rows [2 * ngroups,   3 * ngroups)   V scale per group (symmetric)
#
# Numerics (exact): K_{s,h} = kcode_{s,h} * kscale_{g(h),s} + kmin_{g(h),s}
# with kcode in [0, 15], so
#   scores_s = sum_g kscale_{g,s} * (q_g . kcode_{s,g})
#            + sum_g kmin_{g,s} * sum(q_g)            (one [G,NG]x[NG,S] dot)
# V_{s,h} = vcode_{s,h} * vscale_{g(h),s} with vcode in [-8, 7], so
#   ctx_g = (probs * vscale_g) . vcode_{:,g}  per group.
# ---------------------------------------------------------------------------


def quantize_k_rows_int4_asym(x: jax.Array, group: int = 16):
  """Per-group ASYMMETRIC int4 quantization of K rows.

  x [..., H] float -> (packed uint8 [..., H//2] of codes in [0, 15],
  scale f32 [..., H//group], minv f32 [..., H//group]).
  """
  h = x.shape[-1]
  ng = h // group
  xg = x.astype(jnp.float32).reshape(*x.shape[:-1], ng, group)
  mn = jnp.min(xg, axis=-1)
  mx = jnp.max(xg, axis=-1)
  scale = jnp.maximum(mx - mn, 1e-9) * (1.0 / 15.0)
  codes = jnp.clip(jnp.round((xg - mn[..., None]) / scale[..., None]),
                   0, 15).astype(jnp.uint8).reshape(x.shape)
  lo = codes[..., : h // 2] & 0xF
  hi = codes[..., h // 2:] & 0xF
  return lo | (hi << 4), scale, mn


def quantize_v_rows_int4_group(x: jax.Array, group: int = 16):
  """Per-group SYMMETRIC int4 quantization of V rows.

  x [..., H] float -> (packed uint8 [..., H//2], scale f32 [..., H//group]).
  """
  h = x.shape[-1]
  ng = h // group
  xg = x.astype(jnp.float32).reshape(*x.shape[:-1], ng, group)
  absmax = jnp.max(jnp.abs(xg), axis=-1)
  scale = jnp.maximum(absmax, 1e-9) * (1.0 / 7.0)
  q = jnp.clip(jnp.round(xg / scale[..., None]), -8, 7).astype(
      jnp.int8).reshape(x.shape)
  return pack_int4_rows(q), scale


def build_kv_sidecar_group(k_scale, k_min, v_scale):
  """Stack per-group stats into the kernel sidecar [..., 3*NG, S] bf16.

  Inputs are [..., S, NG] f32 (trailing group axis, matching the
  quantizers above applied to [..., S, H] caches). S stays the minor
  storage dim (bf16 VMEM refs need a 128-multiple minor); the kernel
  expands [NG, S] -> [S, H] transpose-free with one dot contracting NG.
  """
  stats = jnp.concatenate([k_scale, k_min, v_scale], axis=-1)  # [..., S, 3NG]
  return jnp.swapaxes(stats, -1, -2).astype(jnp.bfloat16)     # [..., 3NG, S]


def _ctx_prefix_len_int4_group(q, kp_ref, vp_ref, sc_ref, length,
                               group: int):
  """Per-row context over [0, length): per-group asym-K / sym-V int4.

  q: [G, H] f32. kp_ref/vp_ref: [S, H/2] uint8. sc_ref: [3*NG, S] bf16
  (K scales | K mins | V scales rows). Per-group scales fold INTO the
  unpacked code matrices via one expansion dot each — dot_general
  contracting NG on BOTH sides maps [NG, S] x [NG, H] -> [S, H] with no
  transpose — so the score/context contractions stay single large dots.
  """
  g, h = q.shape
  s = kp_ref.shape[0]
  ng = h // group
  assert ng % 2 == 0, 'split-half packing needs an even group count'
  assert group & (group - 1) == 0, 'group must be a power of two'
  shift = group.bit_length() - 1
  pos = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)
  qb = q.astype(jnp.bfloat16)

  # E[g, h] = 1 iff column h belongs to group g — the UNPACKED column
  # order is split-half (lo nibbles = h < H/2), so map h -> group via
  # the packed byte index.
  iota_g = jax.lax.broadcasted_iota(jnp.int32, (ng, h), 0)
  iota_h = jax.lax.broadcasted_iota(jnp.int32, (ng, h), 1)
  byte_col = jnp.where(iota_h < h // 2, iota_h, iota_h - h // 2)
  grp_of_h = jnp.where(iota_h < h // 2,
                       byte_col >> shift,
                       (byte_col >> shift) + ng // 2)
  expand = (iota_g == grp_of_h).astype(jnp.bfloat16)   # [NG, H]

  k32 = kp_ref[:].astype(jnp.int32)
  kcodes = jnp.concatenate([(k32 & 0xF).astype(jnp.bfloat16),
                            (k32 >> 4).astype(jnp.bfloat16)],
                           axis=-1)                    # [S, H] in [0, 15]
  kscale_cols = jax.lax.dot_general(
      sc_ref[:ng, :].astype(jnp.bfloat16), expand,
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32).astype(jnp.bfloat16)  # [S, H]
  scores = jax.lax.dot_general(
      qb, kcodes * kscale_cols,
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)              # [G, S]
  # Offset term: qsums [G, NG] x kmin [S, NG] -> [G, S], one dot.
  qf = qb.astype(jnp.float32)
  qsums = jnp.concatenate(
      [jnp.sum(qf[:, gi * group:(gi + 1) * group], axis=1, keepdims=True)
       for gi in range(ng)], axis=1)                   # [G, NG]
  # q columns are unpacked-order; regroup sums to match grp_of_h: the
  # concat above follows unpacked order already (group gi spans columns
  # [gi*group, (gi+1)*group) of the unpacked matrix).
  scores += jax.lax.dot_general(
      qsums, sc_ref[ng:2 * ng, :].astype(jnp.float32),
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  scores *= 1.0 / (h ** 0.5)
  scores = jnp.where(pos < length, scores, -1e30)
  scores = scores - jnp.max(scores, axis=1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=1, keepdims=True)

  v32 = vp_ref[:].astype(jnp.int32)
  vcodes = jnp.concatenate([(((v32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16),
                            (((v32 >> 4) ^ 8) - 8).astype(jnp.bfloat16)],
                           axis=-1)                    # [S, H]
  vscale_cols = jax.lax.dot_general(
      sc_ref[2 * ng:, :].astype(jnp.bfloat16), expand,
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32).astype(jnp.bfloat16)  # [S, H]
  ctx = jax.lax.dot_general(
      probs.astype(jnp.bfloat16), vcodes * vscale_cols,
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)              # [G, H]
  return ctx


@functools.partial(
    jax.jit,
    static_argnames=('group', 'batch_block', 'out_dtype', 'interpret'))
def decode_attention_int4_group_lengths(
    q: jax.Array,
    k_packed: jax.Array,
    v_packed: jax.Array,
    sidecar: jax.Array,
    lengths: jax.Array,
    group: int = 16,
    batch_block: int = 4,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
  """Decode attention over per-group asym-K / sym-V int4 KV caches.

  q [B, NK, G, H]; k_packed/v_packed [B, NK, S, H//2] uint8 (K codes
  unsigned, V codes signed split-half); sidecar [B, NK, 3*(H//group), S]
  bf16 (build_kv_sidecar_group); lengths [B] int32. Streams the int8
  path's cache bytes halved plus 6*H/group bytes of sidecar per row
  (~9% of the int8 row at H=256, group=16).
  """
  b, nk, g, h = q.shape
  s = k_packed.shape[2]
  h2 = h // 2
  ng3 = 3 * (h // group)
  bn_rows = b * nk
  bb = max(1, batch_block)
  while bn_rows % bb:
    bb //= 2
  while bb > 1 and 2 * (2 * bb * s * h2) + 2 * bb * s * ng3 > 14 * 2**20:
    bb //= 2
  q2 = q.reshape(bn_rows, g, h).astype(jnp.float32)
  k2 = k_packed.reshape(bn_rows, s, h2)
  v2 = v_packed.reshape(bn_rows, s, h2)
  sc2 = sidecar.reshape(bn_rows, ng3, s).astype(jnp.bfloat16)
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(bn_rows)

  def kernel(lens_ref, q_ref, kp_ref, vp_ref, sc_ref, o_ref):
    row0 = pl.program_id(0) * bb
    for row in range(bb):
      ctx = _ctx_prefix_len_int4_group(
          q_ref[row], kp_ref.at[row], vp_ref.at[row], sc_ref.at[row],
          lens_ref[row0 + row], group)
      o_ref[row] = ctx.astype(o_ref.dtype)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(bn_rows // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h2), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h2), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, ng3, s), lambda i, lens_ref: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, g, h), lambda i, lens_ref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
  )
  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((bn_rows, g, h), out_dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      cost_estimate=pl.CostEstimate(
          flops=4 * bn_rows * g * s * h,
          bytes_accessed=bn_rows * s * (h + ng3 * 2),
          transcendentals=bn_rows * g * s),
      interpret=interpret,
  )(lens, q2, k2, v2, sc2)
  return out.reshape(b, nk, g, h)


def decode_attention_int4_group_ref(q, k_packed, v_packed, sidecar,
                                    lengths, group: int = 16):
  """XLA twin of decode_attention_int4_group_lengths (tests)."""
  b, nk, g, h = q.shape
  s = k_packed.shape[2]
  ng = h // group
  k32 = k_packed.astype(jnp.int32)
  kcodes = jnp.concatenate([(k32 & 0xF), (k32 >> 4)],
                           axis=-1).astype(jnp.float32)        # [B,NK,S,H]
  vq = unpack_int4_rows(v_packed).astype(jnp.float32)
  sc = jnp.swapaxes(sidecar.astype(jnp.float32), -1, -2)      # [B,NK,S,3NG]
  kscale, kmin, vscale = sc[..., :ng], sc[..., ng:2 * ng], sc[..., 2 * ng:]
  k = (kcodes.reshape(b, nk, s, ng, group) * kscale[..., None]
       + kmin[..., None]).reshape(b, nk, s, h)
  v = (vq.reshape(b, nk, s, ng, group) * vscale[..., None]).reshape(
      b, nk, s, h)
  scores = jnp.einsum('bngh,bnsh->bngs', q.astype(jnp.float32), k)
  scores = scores / (h ** 0.5)
  pos = jnp.arange(s)[None, None, None, :]
  scores = jnp.where(pos < lengths[:, None, None, None], scores, -1e30)
  scores = scores - jnp.max(scores, axis=-1, keepdims=True)
  probs = jnp.exp(scores)
  probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
  return jnp.einsum('bngs,bnsh->bngh', probs, v)
