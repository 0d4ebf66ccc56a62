"""On-device quantize/dequantize arithmetic over IR QuantizationInfo.

These are the jnp twins of the host-side numpy numerics
(`algorithms/uniform/quant_numerics.py`); kept in exact numerical agreement
(same rounding, narrow-range, and blockwise expansion rules) so executor
results match the offline pipeline bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.graph import ir


def _expanded_scale_zp(info: ir.QuantizationInfo, shape, ndim: int):
  scale = np.asarray(info.scale, np.float32)
  zp = np.asarray(info.zero_point)
  if info.block_size > 0:
    qdim = info.quantized_dimension
    bshape = list(shape)
    bshape[qdim:qdim + 1] = [shape[qdim] // info.block_size, info.block_size]
    scale = np.broadcast_to(
        np.expand_dims(scale, qdim + 1), bshape).reshape(shape)
    zp = np.broadcast_to(np.expand_dims(zp, qdim + 1), bshape).reshape(shape)
    return jnp.asarray(scale), jnp.asarray(zp.astype(np.int32))
  if scale.size == 1:
    return jnp.asarray(scale.reshape(())), jnp.asarray(
        zp.reshape(()).astype(np.int32))
  qdim = info.quantized_dimension % ndim
  bshape = [1] * ndim
  bshape[qdim] = scale.size
  return (
      jnp.asarray(scale.reshape(bshape)),
      jnp.asarray(zp.reshape(bshape).astype(np.int32)),
  )


def dequantize(q, info: ir.QuantizationInfo, out_dtype=jnp.float32):
  scale, zp = _expanded_scale_zp(info, q.shape, q.ndim)
  return ((q.astype(jnp.float32) - zp) * scale).astype(out_dtype)


def quantize(x, info: ir.QuantizationInfo, storage_dtype):
  scale, zp = _expanded_scale_zp(info, x.shape, x.ndim)
  symmetric = bool(np.all(np.asarray(info.zero_point) == 0))
  qmin = -(2 ** (info.num_bits - 1))
  qmax = 2 ** (info.num_bits - 1) - 1
  if symmetric and info.num_bits >= 8:
    qmin += 1  # narrow range, matches host-side rule
  q = jnp.round(x.astype(jnp.float32) / scale) + zp
  q = jnp.clip(q, qmin, qmax)
  return q.astype(storage_dtype)


STORAGE_JNP_DTYPES = {
    'int2': jnp.int8,
    'int4': jnp.int8,
    'int8': jnp.int8,
    'int16': jnp.int16,
    'int32': jnp.int32,
    'int64': jnp.int64,
    'uint8': jnp.uint8,
    'float16': jnp.float16,
    'bfloat16': jnp.bfloat16,
    'float32': jnp.float32,
    'bool': jnp.bool_,
}


def storage_dtype_of(tensor: ir.Tensor):
  return STORAGE_JNP_DTYPES[tensor.dtype]
