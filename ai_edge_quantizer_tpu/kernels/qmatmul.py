"""Fused dequant + matmul kernels (int8/int4 weights).

The TPU-first design: never materialize a dequantized weight matrix in HBM.
For per-channel symmetric weights the dequant commutes with the contraction:

    y[., o] = sum_i x[., i] * (w_q[o, i] - zp[o]) * s[o]
            = (x @ w_q^T)[., o] * s[o] - (sum_i x[., i]) * zp[o] * s[o]

so the kernel runs the integer-weight matmul on the MXU (bf16/int8 operands)
and applies scales to the f32 accumulator — one HBM read of the packed
weights, no f32 weight traffic. Blockwise scales contract per block inside
the same kernel.

`qmatmul` auto-selects the Pallas TPU kernel (kernels/pallas_qmatmul.py)
when available and falls back to an XLA-fusable jnp reference everywhere
else. The two paths are tested against each other.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def qmatmul_ref(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    zero_point: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    block_size: int = 0,
    out_dtype=None,
) -> jax.Array:
  """XLA reference: x [..., K] · int weights w_q [N, K] -> [..., N].

  scale: [N] (per-channel), [] (per-tensor), or [N, K // block_size]
  (blockwise). zero_point matches scale's shape (None => symmetric).
  """
  out_dtype = out_dtype or x.dtype
  compute = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
  xw = x.astype(compute)
  if block_size > 0:
    n, k = w_q.shape
    nb = k // block_size
    xb = xw.reshape(x.shape[:-1] + (nb, block_size))
    wb = w_q.reshape(n, nb, block_size).astype(compute)
    # Contract within blocks, scale per (out-channel, block), sum blocks.
    partial = jnp.einsum('...bk,nbk->...nb', xb, wb,
                         preferred_element_type=jnp.float32)
    if zero_point is not None:
      xsum = jnp.sum(xb, axis=-1, dtype=jnp.float32)  # [..., nb]
      partial = partial - xsum[..., None, :] * zero_point.astype(jnp.float32)
    y = jnp.einsum('...nb,nb->...n', partial, scale.astype(jnp.float32))
  else:
    y = jnp.einsum('...k,nk->...n', xw, w_q.astype(compute),
                   preferred_element_type=jnp.float32)
    s = scale.astype(jnp.float32).reshape(-1)
    if zero_point is not None:
      zp = zero_point.astype(jnp.float32).reshape(-1)
      xsum = jnp.sum(xw, axis=-1, dtype=jnp.float32, keepdims=True)
      y = y - xsum * zp
    y = y * s
  if bias is not None:
    y = y + bias.astype(jnp.float32)
  return y.astype(out_dtype)


def dynamic_quantize_activation(x: jax.Array, num_bits: int = 8):
  """Per-row (last-dim) dynamic symmetric quantization of activations.

  Returns (x_q int8, scale f32 [..., 1]). Used by the DRQ execution path:
  activation ranges are computed on device at runtime.
  """
  qmax = float(2 ** (num_bits - 1) - 1)
  absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
  scale = jnp.maximum(absmax, 1e-9) / qmax
  x_q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
  return x_q, scale.astype(jnp.float32)


def drq_matmul_ref(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    act_num_bits: int = 8,
) -> jax.Array:
  """Dynamic-range path: quantize acts on the fly, int8 x int8 -> int32 on
  the MXU, rescale by act_scale * w_scale."""
  x_q, x_scale = dynamic_quantize_activation(x, act_num_bits)
  acc = jax.lax.dot_general(
      x_q, w_q,
      dimension_numbers=(((x_q.ndim - 1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32,
  )
  y = acc.astype(jnp.float32) * x_scale * w_scale.reshape(-1).astype(
      jnp.float32)
  if bias is not None:
    y = y + bias.astype(jnp.float32)
  return y.astype(x.dtype)


def drq_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    act_num_bits: int = 8,
    prefer_pallas: bool = True,
) -> jax.Array:
  """DRQ dispatch: int8 x int8 Pallas kernel (acts quantized in-kernel)
  on TPU for aligned shapes; XLA reference otherwise.

  Disable the kernel with AEQT_INT8_PALLAS=0.
  """
  import os
  n, k = w_q.shape
  if (
      prefer_pallas and act_num_bits == 8
      and jax.default_backend() == 'tpu'
      and w_q.dtype == jnp.int8
      and k % 256 == 0 and n % 128 == 0
      and os.environ.get('AEQT_INT8_PALLAS', '1') == '1'
  ):
    from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
    try:
      return pallas_qmatmul.qmatmul_pallas_int8_drq(
          x, w_q, w_scale, bias=bias)
    except Exception:  # pragma: no cover - fall back on any kernel issue
      pass
  return drq_matmul_ref(x, w_q, w_scale, bias=bias,
                        act_num_bits=act_num_bits)


def srq_matmul(
    x_q: jax.Array,
    x_scale,
    x_zero_point,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
) -> jax.Array:
  """Static-range integer matmul: int8 x int8 -> int32 on the MXU.

  x_q [..., K] int8 with per-TENSOR (x_scale, x_zero_point); w_q [N, K]
  int8 symmetric with per-channel (or scalar) w_scale. The activation
  zero point enters in closed form through the per-channel weight row
  sums (constant-folded by XLA):

      y = (x_q . w_q^T  -  zp_x * rowsum(w_q)) * s_x * s_w  + bias

  This is the path the reference's integer kernels take (XNNPACK QS8):
  both operands stay int8 all the way into the systolic array — 8x the
  f32 MXU rate the dequantize-first path pays.
  """
  acc = jax.lax.dot_general(
      x_q, w_q,
      dimension_numbers=(((x_q.ndim - 1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32,
  )
  zp = jnp.asarray(x_zero_point, jnp.int32).reshape(())
  row_sums = jnp.sum(w_q.astype(jnp.int32), axis=1)  # [N], folded by XLA
  acc = acc - zp * row_sums
  y = acc.astype(jnp.float32) * (
      jnp.asarray(x_scale, jnp.float32).reshape(())
      * w_scale.astype(jnp.float32).reshape(-1))
  if bias is not None:
    y = y + bias.astype(jnp.float32)
  return y.astype(out_dtype)


def qmatmul(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    zero_point: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    block_size: int = 0,
    prefer_pallas: bool = True,
) -> jax.Array:
  """Fused dequant-matmul with automatic kernel selection."""
  if prefer_pallas and _pallas_eligible(x, w_q, zero_point, block_size):
    from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
    try:
      return pallas_qmatmul.qmatmul_pallas(
          x, w_q, scale, bias=bias, block_size=block_size)
    except Exception:  # pragma: no cover - fall back on any kernel issue
      pass
  return qmatmul_ref(x, w_q, scale, zero_point, bias, block_size)


def _pallas_eligible(x, w_q, zero_point, block_size) -> bool:
  if jax.default_backend() != 'tpu':
    return False
  if zero_point is not None:
    return False
  n, k = w_q.shape
  return k % 256 == 0 and n % 128 == 0
