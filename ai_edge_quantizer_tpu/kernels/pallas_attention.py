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
  len [1, 1] int32 in SMEM. Output [G, H] f32.
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
  lens = jnp.repeat(lengths.astype(jnp.int32), nk).reshape(b * nk, 1)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=0,
      grid=(b * nk,),
      in_specs=[
          pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
          pl.BlockSpec((1, g, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, g, h), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
  )

  def kernel(len_ref, q_ref, k_ref, v_ref, scales_ref, o_ref):
    _decode_attn_kernel(
        len_ref,
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


@functools.partial(
    jax.jit, static_argnames=('interpret', 'k_zero_point', 'v_zero_point'))
def decode_attention_int8_masked(
    q: jax.Array,
    k_cache_q: jax.Array,
    v_cache_q: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    mask: jax.Array,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
  """Fused int8-cache attention with an additive mask (graph semantics).

  q: [B, NK, G, H]; caches: [B, NK, S, H] int8 (per-tensor scale +
  optional zero point); mask: [B, 1, G, S] additive (0 = visible).
  Returns [B, NK, G, H] f32.
  """
  b, nk, g, h = q.shape
  s = k_cache_q.shape[2]
  q2 = q.reshape(b * nk, g, h).astype(jnp.float32)
  k2 = k_cache_q.reshape(b * nk, s, h)
  v2 = v_cache_q.reshape(b * nk, s, h)
  m2 = jnp.broadcast_to(mask.astype(jnp.float32), (b, nk, g, s)).reshape(
      b * nk, g, s)
  scales = jnp.stack(
      [jnp.asarray(k_scale, jnp.float32).reshape(()),
       jnp.asarray(v_scale, jnp.float32).reshape(()),
       jnp.asarray(k_zero_point, jnp.float32).reshape(()),
       jnp.asarray(v_zero_point, jnp.float32).reshape(())]).reshape(1, 4)

  def kernel(q_ref, k_ref, v_ref, m_ref, scales_ref, o_ref):
    _decode_attn_mask_kernel(
        q_ref.at[0], k_ref.at[0], v_ref.at[0], m_ref.at[0], scales_ref,
        o_ref.at[0])

  out = pl.pallas_call(
      kernel,
      grid=(b * nk,),
      in_specs=[
          pl.BlockSpec((1, g, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, g, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, g, h), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b * nk, g, h), jnp.float32),
      interpret=interpret,
  )(q2, k2, v2, m2, scales)
  return out.reshape(b, nk, g, h)
