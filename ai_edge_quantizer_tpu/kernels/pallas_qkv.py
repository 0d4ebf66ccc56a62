"""Pallas TPU kernel: RMS-norm + fused-QKV projection + rope, one call.

The decode-layer prologue — pre-attention RMS_NORM, the packed-int4
fused QKV matmul, the q/k/v head split, and rotary embedding of q and k
— runs as a single pallas_call. The norm output, the [B, QKV_N] qkv
activation, and the pre-rope head tensors never reach HBM; the kernel
emits exactly the three tensors the rest of the layer consumes:
grouped rope'd queries, and the rope'd/raw k/v rows that feed the int8
KV-cache update.

Replaces this unfused chain (reference graph ops; see
models/gemma.py:190-260 and the reference's GenAI decoder graphs built
from RMS_NORM + FULLY_CONNECTED + SLICE + ROPE + RESHAPE/TRANSPOSE —
e.g. /root/reference/ai_edge_quantizer/recipe.py:321-397 quantizes the
same per-layer FCs):

  RMS_NORM -> FC(qkv) -> SLICE x3 -> RESHAPE/ROPE/TRANSPOSE (q, k)

Numerics: each fused stage rounds through the activation dtype (bf16 in
serving mode) exactly where the unfused executor stored an
intermediate, so fused and unfused outputs agree bit-for-bit: norm
output cast to bf16, FC output cast to bf16, rope computed in f32 and
cast back to bf16. DRQ mode quantizes the norm output per row to int8
in-kernel and runs the matmul on the int8 MXU (the reference's
dynamic-range semantics).

Weight layout: canonical split-half packed int4 [QKV_N, D//2] uint8
(kernels/pallas_qmatmul.pack_int4_split), per-channel f32 scales.
Resident in VMEM across the M grid (constant index map) — 2.6 MB at
Gemma-2B shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ai_edge_quantizer_tpu.kernels.pallas_qmatmul import _round_up


def _rope_pair(x1, x2, cos, sin):
  """Half-split rotary: returns (x1*cos - x2*sin, x2*cos + x1*sin)."""
  return x1 * cos - x2 * sin, x2 * cos + x1 * sin


def _qkv_rope_kernel(nq, nk, h, eps, drq, cast_dt,
                     x_ref, g_ref, w_ref, s_ref, cos_ref, sin_ref,
                     q_ref, k_ref, v_ref):
  """One M-tile: norm -> qkv matmul (per-head weight chunks) -> rope.

  The weight unpack is chunked per output head: whole-tensor
  `w_ref[:].astype(int32)` would materialize a [QKV_N, D//2] int32 VMEM
  temp (10.5 MB at Gemma-2B shape) and blow the 16 MB Mosaic scoped
  limit; per-head chunks peak at [H, D//2] (1 MB).
  """
  x = x_ref[:]
  xf = x.astype(jnp.float32)
  var = jnp.mean(xf * xf, axis=1, keepdims=True)
  rs = jax.lax.rsqrt(var + eps)
  # Unfused twin: y = (x * rsqrt.astype(x.dtype)) * gamma, stored bf16.
  xn = ((x * rs.astype(cast_dt)).astype(jnp.float32)
        * g_ref[:]).astype(cast_dt)

  k2 = w_ref.shape[1]  # D // 2 byte columns
  if drq:
    xnf = xn.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xnf), axis=1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-9) * (1.0 / 127.0)
    xq = jnp.round(xnf * pl.reciprocal(xs, approx=False)).astype(jnp.int8)

  def head_block(i):
    """Head i's projection [m, h] in cast_dt (the unfused FC boundary)."""
    w32 = w_ref[i * h:(i + 1) * h, :].astype(jnp.int32)
    if drq:
      lo = (((w32 & 0xF) ^ 8) - 8).astype(jnp.int8)
      hi = (((w32 >> 4) ^ 8) - 8).astype(jnp.int8)
      acc = jax.lax.dot_general(
          xq[:, :k2], lo, dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.int32)
      acc += jax.lax.dot_general(
          xq[:, k2:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.int32)
      seg = acc.astype(jnp.float32) * xs * s_ref[0, i * h:(i + 1) * h]
    else:
      lo = (((w32 & 0xF) ^ 8) - 8).astype(cast_dt)
      hi = (((w32 >> 4) ^ 8) - 8).astype(cast_dt)
      acc = jax.lax.dot_general(
          xn[:, :k2], lo, dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      acc += jax.lax.dot_general(
          xn[:, k2:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      seg = acc * s_ref[0, i * h:(i + 1) * h]
    return seg.astype(cast_dt)

  cos = cos_ref[:]  # [m, h//2] f32
  sin = sin_ref[:]
  half = h // 2

  def rope_head(seg):
    """seg [m, h] in cast_dt -> rope'd [m, h] in cast_dt (f32 math)."""
    x1 = seg[:, :half].astype(jnp.float32)
    x2 = seg[:, half:].astype(jnp.float32)
    r1, r2 = _rope_pair(x1, x2, cos, sin)
    return jnp.concatenate([r1, r2], axis=1).astype(cast_dt)

  for i in range(nq):
    q_ref[:, i * h:(i + 1) * h] = rope_head(head_block(i))
  for i in range(nk):
    k_ref[:, i * h:(i + 1) * h] = rope_head(head_block(nq + i))
  for i in range(nk):
    v_ref[:, i * h:(i + 1) * h] = head_block(nq + nk + i)


@functools.partial(
    jax.jit,
    static_argnames=('nq', 'nk', 'h', 'eps', 'drq', 'bm', 'interpret'))
def qkv_rope_pallas(
    x: jax.Array,
    gamma: jax.Array,
    w_packed: jax.Array,
    scale: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    *,
    nq: int,
    nk: int,
    h: int,
    eps: float = 1e-6,
    drq: bool = True,
    bm: int = 256,
    interpret: bool = False,
) -> tuple:
  """Fused norm + qkv projection + rope.

  x [..., D] (residual stream, pre-norm); gamma [D] f32; w_packed
  [(nq+2*nk)*h, D//2] uint8 split-half packed int4; scale [(nq+2*nk)*h]
  f32; cos/sin [..., h//2] f32 per leading row (position-derived).
  Returns (q [..., nq*h], k [..., nk*h], v [..., nk*h]) in x.dtype —
  q/k rope'd, laid out head-major (== the graph's grouped/transposed
  views at T=1).
  """
  qkv_n, d2 = w_packed.shape
  d = d2 * 2
  if qkv_n != (nq + 2 * nk) * h:
    raise ValueError(f'weight rows {qkv_n} != (nq+2nk)*h '
                     f'{(nq + 2 * nk) * h}')
  lead_shape = x.shape[:-1]
  m = 1
  for dim in lead_shape:
    m *= dim
  cast_dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
  x2 = x.reshape(m, d).astype(cast_dt)
  cos2 = cos.reshape(m, h // 2).astype(jnp.float32)
  sin2 = sin.reshape(m, h // 2).astype(jnp.float32)
  sublane = 32 if drq else (16 if cast_dt == jnp.bfloat16 else 8)
  m_pad = _round_up(max(m, sublane), sublane)
  if m_pad != m:
    pad = ((0, m_pad - m), (0, 0))
    x2 = jnp.pad(x2, pad)
    cos2 = jnp.pad(cos2, pad)
    sin2 = jnp.pad(sin2, pad)
  bm_ = min(bm, m_pad)
  while m_pad % bm_:
    bm_ //= 2
  n_m = m_pad // bm_

  out_shapes = (
      jax.ShapeDtypeStruct((m_pad, nq * h), cast_dt),
      jax.ShapeDtypeStruct((m_pad, nk * h), cast_dt),
      jax.ShapeDtypeStruct((m_pad, nk * h), cast_dt),
  )
  q, k, v = pl.pallas_call(
      functools.partial(_qkv_rope_kernel, nq, nk, h, float(eps), drq,
                        cast_dt),
      grid=(n_m,),
      in_specs=[
          pl.BlockSpec((bm_, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((qkv_n, d2), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, qkv_n), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bm_, h // 2), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bm_, h // 2), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((bm_, nq * h), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bm_, nk * h), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bm_, nk * h), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=out_shapes,
      cost_estimate=pl.CostEstimate(
          flops=2 * m_pad * qkv_n * d,
          bytes_accessed=m_pad * d * 2 + qkv_n * d2 + m_pad * qkv_n * 2,
          transcendentals=0),
      interpret=interpret,
  )(x2, gamma.astype(jnp.float32).reshape(1, d),
    w_packed, scale.astype(jnp.float32).reshape(1, qkv_n), cos2, sin2)
  return (q[:m].reshape(lead_shape + (nq * h,)),
          k[:m].reshape(lead_shape + (nk * h,)),
          v[:m].reshape(lead_shape + (nk * h,)))


def rope_cos_sin(positions: jax.Array, h: int, base: float) -> tuple:
  """cos/sin tables for the half-split rope at integer positions.

  positions [...] int -> (cos, sin) [..., h//2] f32. Shared by every
  layer of a step (same positions), so XLA computes it once.
  """
  import numpy as np
  half = h // 2
  # Host-computed like ops/impl.py ROPE (float64 power, rounded to f32)
  # so fused and unfused rope angles are bit-identical.
  freqs = np.asarray(
      base ** (-np.arange(0, half, dtype=np.float32) / half), np.float32)
  angles = positions.astype(jnp.float32)[..., None] * jnp.asarray(freqs)
  return jnp.cos(angles), jnp.sin(angles)
