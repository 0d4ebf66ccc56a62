"""Greedy-head megakernel: logits matmul + argmax in one pallas_call.

At decode time a greedy sampler only needs ``argmax(x @ W_head^T)``; the
[B, vocab] logits tensor itself (131 MB bf16 at B=256 over Gemma's 256k
vocab) exists only to be reduced. Fusing the argmax into the vocab-tiled
matmul keeps each logits tile in VMEM and writes just [B] token ids to
HBM — the HBM round trip of the largest activation in the model
disappears, and the 256k-row weight stream stays the only traffic.

Reference semantics anchor: the logits head is an ordinary
FULLY_CONNECTED in the reference graphs (quantized like any weight op,
e.g. /root/reference/ai_edge_quantizer/recipe.py:321-397 GenAI mixed
recipes); greedy sampling there happens in the host runtime. This
kernel is the TPU-serving expression of that same contract: identical
quantized-matmul numerics, argmax tie-breaking matching
``jnp.argmax`` (first occurrence wins).

Weight formats: canonical split-half packed int4 (kernels/
pallas_qmatmul.pack_int4_split) or plain int8 [N, K]; per-channel f32
scales; optional N-padding (padded rows masked to -inf in-kernel so
they can never win the argmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ai_edge_quantizer_tpu.kernels.pallas_qmatmul import (
    _pick_tile,
    _round_up,
)

_NEG_INF = -3.4e38  # python float: a jnp scalar would be a captured const


def _head_argmax_kernel(nb, bn, true_n, packed, drq, cast_dt,
                        x_ref, w_ref, s_ref, idx_ref,
                        xq_ref, xs_ref, rmax_ref, ridx_ref):
  """One vocab tile: logits tile in VMEM -> running (max, argmax)."""
  i = pl.program_id(0)

  if drq:
    @pl.when(i == 0)
    def _():
      x = x_ref[:].astype(jnp.float32)
      absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
      xs = jnp.maximum(absmax, 1e-9) * (1.0 / 127.0)
      xs_ref[:] = xs
      xq_ref[:] = jnp.round(x * pl.reciprocal(xs, approx=False)).astype(
          jnp.int8)

  if packed:
    w32 = w_ref[:].astype(jnp.int32)
    lo = (((w32 & 0xF) ^ 8) - 8)
    hi = (((w32 >> 4) ^ 8) - 8)
    k2 = w32.shape[1]
    if drq:
      acc = jax.lax.dot_general(
          xq_ref[:, :k2], lo.astype(jnp.int8),
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.int32)
      acc += jax.lax.dot_general(
          xq_ref[:, k2:], hi.astype(jnp.int8),
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.int32)
      y = acc.astype(jnp.float32) * xs_ref[:] * s_ref[:]
    else:
      xb = x_ref[:].astype(jnp.bfloat16)
      acc = jax.lax.dot_general(
          xb[:, :k2], lo.astype(jnp.bfloat16),
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      acc += jax.lax.dot_general(
          xb[:, k2:], hi.astype(jnp.bfloat16),
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      y = acc * s_ref[:]
  else:
    if drq:
      acc = jax.lax.dot_general(
          xq_ref[:], w_ref[:],
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.int32)
      y = acc.astype(jnp.float32) * xs_ref[:] * s_ref[:]
    else:
      y = jax.lax.dot_general(
          x_ref[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32) * s_ref[:]

  # Compare at the dtype the unfused path would have produced (the FC
  # emits bf16 activations downstream of a bf16 executor), so fused and
  # unfused greedy tokens agree bit-for-bit.
  y = y.astype(cast_dt).astype(jnp.float32)
  m, _ = y.shape
  col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
  gcol = col + i * bn
  y = jnp.where(gcol < true_n, y, _NEG_INF)
  tile_max = jnp.max(y, axis=1, keepdims=True)
  # First-occurrence argmax: min global column among the tile maxima.
  tile_idx = jnp.min(jnp.where(y == tile_max, gcol, jnp.int32(2**30)),
                     axis=1, keepdims=True)

  @pl.when(i == 0)
  def _():
    rmax_ref[:] = jnp.full(rmax_ref.shape, _NEG_INF, jnp.float32)
    ridx_ref[:] = jnp.zeros(ridx_ref.shape, jnp.int32)

  better = tile_max > rmax_ref[:]
  rmax_ref[:] = jnp.where(better, tile_max, rmax_ref[:])
  ridx_ref[:] = jnp.where(better, tile_idx, ridx_ref[:])

  @pl.when(i == nb - 1)
  def _():
    idx_ref[:] = ridx_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=('packed', 'true_n', 'bn', 'drq', 'interpret'))
def head_argmax_pallas(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    *,
    packed: bool,
    true_n: int | None = None,
    bn: int = 512,
    drq: bool = True,
    interpret: bool = False,
) -> jax.Array:
  """argmax over the quantized logits head, without materializing logits.

  x [..., K] float; w_q [N, K//2] uint8 (packed int4 split-half) or
  [N, K] int8; scale [N] f32 per-channel. Returns int32 [...] token ids
  over the first ``true_n`` (default N) rows. Numerics per tile match
  qmatmul_pallas_int4_packed_drq / qmatmul_pallas_int8_drq (drq=True) or
  the bf16 weight-only kernels (drq=False), compared at x.dtype.
  """
  n = w_q.shape[0]
  k = w_q.shape[1] * 2 if packed else w_q.shape[1]
  if true_n is None:
    true_n = n
  lead_shape = x.shape[:-1]
  m = 1
  for d in lead_shape:
    m *= d
  x2 = x.reshape(m, k).astype(jnp.float32)
  m_pad = _round_up(max(m, 8), 8)
  if m_pad != m:
    x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
  # The grid may overhang N (Pallas pads the tail block): overhang
  # columns carry garbage but sit at gcol >= true_n, which the kernel
  # masks to -inf before the reduction. This keeps the wide 512-row
  # N-tile on the 256128-row Gemma head (bn=128, the largest true
  # divisor, measured ~2x slower on this shape).
  if n % bn:
    bn = bn if n > bn else _pick_tile(n, bn)
    true_n = min(true_n, n)
  nb = -(-n // bn)
  cast_dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
  kb = w_q.shape[1]  # byte columns (packed) or K (int8)

  out = pl.pallas_call(
      functools.partial(_head_argmax_kernel, nb, bn, true_n, packed, drq,
                        cast_dt),
      grid=(nb,),
      in_specs=[
          pl.BlockSpec((m_pad, k), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bn, kb), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((m_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
      scratch_shapes=[
          pltpu.VMEM((m_pad, k), jnp.int8),
          pltpu.VMEM((m_pad, 1), jnp.float32),
          pltpu.VMEM((m_pad, 1), jnp.float32),
          pltpu.VMEM((m_pad, 1), jnp.int32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=2 * m_pad * n * k,
          bytes_accessed=m_pad * k * 4 + n * kb + m_pad * 4,
          transcendentals=0),
      interpret=interpret,
  )(x2, w_q, scale.astype(jnp.float32).reshape(1, n))
  return out[:m, 0].reshape(lead_shape)
