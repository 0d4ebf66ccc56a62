"""Pallas TPU kernel: fused dequant + matmul for integer weights.

The decode-path hot loop. The weight matrix streams HBM -> VMEM in its
integer storage form (the only full pass over the weights); dequantization
happens in VMEM registers fused into the MXU feed, and per-channel scales
apply to the f32 accumulator. No dequantized weight copy ever exists in HBM.

Grid: one program per N-tile; the full K extent of the weight tile sits in
VMEM (K * BN int8 <= ~4 MiB for transformer shapes) and Pallas
double-buffers the weight stream across grid steps, overlapping the HBM
reads of tile i+1 with the MXU work of tile i.

Blockwise variant contracts per (channel, block) with fp16-grid scales.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


def _channelwise_kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
  """o[M, BN] = x[M, K] . w[BN, K]^T * s[BN] (+ b[BN])."""
  w = w_ref[:].astype(jnp.float32)
  acc = jax.lax.dot_general(
      x_ref[:], w,
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  y = acc * s_ref[:].reshape(1, -1)
  if b_ref is not None:
    y = y + b_ref[:].reshape(1, -1)
  o_ref[:] = y


def _blockwise_kernel(nblocks, x_ref, w_ref, s_ref, b_ref, o_ref):
  """o[M, BN] = sum_b (x_b . w_b^T) * s[BN, b], block-diagonal scales."""
  bn, k = w_ref.shape
  bs = k // nblocks
  m = x_ref.shape[0]
  w = w_ref[:].astype(jnp.float32).reshape(bn, nblocks, bs)
  x = x_ref[:].reshape(m, nblocks, bs)
  # partial[M, BN, nb]: per-block contractions, then scale-weighted sum.
  partial = jax.lax.dot_general(
      x, w,
      dimension_numbers=(((2,), (2,)), ((1,), (1,))),
      preferred_element_type=jnp.float32,
  )  # [nb, M, BN]
  scales = s_ref[:]  # [BN, nb]
  y = jnp.einsum('bmn,nb->mn', partial, scales,
                 preferred_element_type=jnp.float32)
  if b_ref is not None:
    y = y + b_ref[:].reshape(1, -1)
  o_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=('block_size', 'bn', 'interpret'))
def qmatmul_pallas(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    block_size: int = 0,
    bn: int = 256,
    interpret: bool = False,
) -> jax.Array:
  """x [..., K] . int weights w_q [N, K] -> [..., N], scales fused.

  Symmetric weights (per-channel scale [N] or blockwise [N, K//block_size]).
  """
  n, k = w_q.shape
  lead_shape = x.shape[:-1]
  m = 1
  for d in lead_shape:
    m *= d
  x2 = x.reshape(m, k).astype(jnp.float32)
  # Pad rows to the f32 sublane multiple.
  m_pad = _round_up(max(m, 8), 8)
  if m_pad != m:
    x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
  bn = min(bn, n)
  if n % bn != 0:
    raise ValueError(f'N={n} not divisible by tile {bn}.')

  scale = scale.astype(jnp.float32)
  has_bias = bias is not None
  if block_size > 0:
    nblocks = k // block_size
    kernel = functools.partial(_blockwise_kernel, nblocks)
    s_spec = pl.BlockSpec((bn, nblocks), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    scale = scale.reshape(n, nblocks)
  else:
    kernel = _channelwise_kernel
    s_spec = pl.BlockSpec((bn,), lambda i: (i,), memory_space=pltpu.VMEM)
    scale = scale.reshape(n)

  in_specs = [
      pl.BlockSpec((m_pad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
      s_spec,
  ]
  operands = [x2, w_q, scale]
  if has_bias:
    in_specs.append(
        pl.BlockSpec((bn,), lambda i: (i,), memory_space=pltpu.VMEM))
    operands.append(bias.astype(jnp.float32).reshape(n))
    body = kernel
  else:
    body = lambda x_ref, w_ref, s_ref, o_ref: kernel(
        x_ref, w_ref, s_ref, None, o_ref)

  flops = 2 * m_pad * n * k
  bytes_accessed = (
      m_pad * k * 4 + n * k * w_q.dtype.itemsize + m_pad * n * 4)
  out = pl.pallas_call(
      body,
      grid=(n // bn,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((m_pad, bn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
      interpret=interpret,
  )(*operands)
  out = out[:m]
  return out.reshape(lead_shape + (n,)).astype(x.dtype)
