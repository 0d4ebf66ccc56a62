"""JAX implementations of every graph op.

The executor evaluates a Graph by dispatching each op here. Every impl is
traceable (jit-safe, static shapes). Quantized-tensor handling: the executor
presents float inputs to generic impls (dequantizing stored int tensors) and
re-quantizes outputs per the output tensor's params — the simulated-
quantization contract. Hot ops (FULLY_CONNECTED / CONV / BATCH_MATMUL /
attention) additionally have true integer-storage fast paths in `kernels/`
used by the serving executor.

Parity: the op vocabulary of the reference's LiteRT runtime (executed there
by the TFLite C++ interpreter, here by XLA).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.graph import ir


@dataclasses.dataclass
class OpContext:
  """What an op impl can see."""

  op: ir.Op
  subgraph: ir.Subgraph
  graph: ir.Graph

  @property
  def attrs(self) -> dict:
    return self.op.attrs

  def in_tensor(self, i: int) -> Optional[ir.Tensor]:
    tid = self.op.inputs[i]
    return self.subgraph.tensors[tid] if tid >= 0 else None

  def out_tensor(self, i: int) -> ir.Tensor:
    return self.subgraph.tensors[self.op.outputs[i]]


OPS: dict = {}


def register(name: str) -> Callable:
  def deco(fn):
    OPS[name] = fn
    return fn
  return deco


def _fused_activation(x, kind: str):
  if kind in (None, 'NONE'):
    return x
  if kind == 'RELU':
    return jax.nn.relu(x)
  if kind == 'RELU6':
    return jnp.clip(x, 0.0, 6.0)
  if kind == 'TANH':
    return jnp.tanh(x)
  raise ValueError(f'Unsupported fused activation: {kind}')


# -- matmul family ----------------------------------------------------------


@register('FULLY_CONNECTED')
def fully_connected(ctx: OpContext, x, w, b=None):
  """x [..., in] @ w[out, in]^T + b."""
  y = jnp.einsum('...i,oi->...o', x, w,
                 preferred_element_type=jnp.float32).astype(x.dtype)
  if b is not None:
    y = y + b
  return _fused_activation(y, ctx.attrs.get('fused_activation', 'NONE'))


@register('BATCH_MATMUL')
def batch_matmul(ctx: OpContext, a, b):
  adj_x = ctx.attrs.get('adj_x', False)
  adj_y = ctx.attrs.get('adj_y', False)
  if adj_x:
    a = jnp.swapaxes(a, -1, -2)
  if adj_y:
    b = jnp.swapaxes(b, -1, -2)
  return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


@register('EMBEDDING_LOOKUP')
def embedding_lookup(ctx: OpContext, ids, table):
  return jnp.take(table, ids.astype(jnp.int32), axis=0)


# -- convolutions (NHWC activations; weight layouts per graph/builder.py) ---


def _pad_str(p: str) -> str:
  return p if isinstance(p, str) else 'SAME'


@register('CONV_2D')
def conv2d(ctx: OpContext, x, w, b=None):
  s = int(ctx.attrs.get('stride', 1))
  y = jax.lax.conv_general_dilated(
      x, w, window_strides=(s, s), padding=_pad_str(
          ctx.attrs.get('padding', 'SAME')),
      dimension_numbers=('NHWC', 'OHWI', 'NHWC'),
      preferred_element_type=jnp.float32,
  ).astype(x.dtype)
  if b is not None:
    y = y + b
  return _fused_activation(y, ctx.attrs.get('fused_activation', 'NONE'))


@register('DEPTHWISE_CONV_2D')
def depthwise_conv2d(ctx: OpContext, x, w, b=None):
  s = int(ctx.attrs.get('stride', 1))
  ch = w.shape[-1]
  w_dw = jnp.transpose(w, (3, 1, 2, 0))  # [ch, kh, kw, 1]
  y = jax.lax.conv_general_dilated(
      x, w_dw, window_strides=(s, s),
      padding=_pad_str(ctx.attrs.get('padding', 'SAME')),
      dimension_numbers=('NHWC', 'OHWI', 'NHWC'),
      feature_group_count=ch,
      preferred_element_type=jnp.float32,
  ).astype(x.dtype)
  if b is not None:
    y = y + b
  return _fused_activation(y, ctx.attrs.get('fused_activation', 'NONE'))


@register('CONV_2D_TRANSPOSE')
def conv2d_transpose(ctx: OpContext, output_shape, w, x, b=None):
  s = int(ctx.attrs.get('stride', 1))
  # w is [out, kh, kw, in]; conv_transpose wants HWIO = [kh, kw, in, out].
  w_t = jnp.transpose(w, (1, 2, 3, 0))
  y = jax.lax.conv_transpose(
      x, w_t, strides=(s, s),
      padding=_pad_str(ctx.attrs.get('padding', 'SAME')),
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
  ).astype(x.dtype)
  if b is not None:
    y = y + b
  return _fused_activation(y, ctx.attrs.get('fused_activation', 'NONE'))


# -- pooling / resize -------------------------------------------------------


def _pool(x, size, stride, padding, init, fn):
  return jax.lax.reduce_window(
      x, init, fn, window_dimensions=(1, size, size, 1),
      window_strides=(1, stride, stride, 1), padding=padding)


@register('AVERAGE_POOL_2D')
def average_pool_2d(ctx: OpContext, x):
  size = int(ctx.attrs.get('filter_size', 2))
  s = int(ctx.attrs.get('stride', 2))
  p = _pad_str(ctx.attrs.get('padding', 'VALID'))
  sums = _pool(x, size, s, p, 0.0, jax.lax.add)
  counts = _pool(jnp.ones_like(x), size, s, p, 0.0, jax.lax.add)
  return sums / counts


@register('MAX_POOL_2D')
def max_pool_2d(ctx: OpContext, x):
  size = int(ctx.attrs.get('filter_size', 2))
  s = int(ctx.attrs.get('stride', 2))
  return _pool(x, size, s, _pad_str(ctx.attrs.get('padding', 'VALID')),
               -jnp.inf, jax.lax.max)


@register('RESIZE_BILINEAR')
def resize_bilinear(ctx: OpContext, x, size=None):
  out_shape = ctx.out_tensor(0).shape
  return jax.image.resize(x, out_shape, method='bilinear')


@register('RESIZE_NEAREST_NEIGHBOR')
def resize_nearest(ctx: OpContext, x, size=None):
  out_shape = ctx.out_tensor(0).shape
  return jax.image.resize(x, out_shape, method='nearest')


@register('SPACE_TO_DEPTH')
def space_to_depth(ctx: OpContext, x):
  bs = int(ctx.attrs.get('block_size', 2))
  n, h, w, c = x.shape
  x = x.reshape(n, h // bs, bs, w // bs, bs, c)
  x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
  return x.reshape(n, h // bs, w // bs, bs * bs * c)


# -- shape ops --------------------------------------------------------------


@register('RESHAPE')
def reshape(ctx: OpContext, x, shape=None):
  return jnp.reshape(x, ctx.out_tensor(0).shape)


@register('TRANSPOSE')
def transpose(ctx: OpContext, x, perm=None):
  p = ctx.attrs.get('perm')
  if p is None and perm is not None:
    p = np.asarray(perm).tolist()
  return jnp.transpose(x, p)


@register('CONCATENATION')
def concatenation(ctx: OpContext, *xs):
  return jnp.concatenate(xs, axis=int(ctx.attrs.get('axis', -1)))


@register('SLICE')
def slice_op(ctx: OpContext, x, begin=None, size=None):
  begin = ctx.attrs.get('begin', begin)
  out_shape = ctx.out_tensor(0).shape
  if isinstance(begin, (np.ndarray, list, tuple)):
    starts = [int(b) for b in np.asarray(begin)]
  else:
    # `begin` is a graph input (traced): dynamic_slice takes per-dim
    # scalar index arrays; the output shape stays static from the IR.
    starts = [begin[i] for i in range(len(out_shape))]
  return jax.lax.dynamic_slice(x, starts, out_shape)


@register('STRIDED_SLICE')
def strided_slice(ctx: OpContext, x, begin=None, end=None, strides=None):
  begin = np.asarray(ctx.attrs.get('begin', begin)).astype(int)
  end = np.asarray(ctx.attrs.get('end', end)).astype(int)
  strides = np.asarray(ctx.attrs.get('strides', strides)).astype(int)
  idx = tuple(slice(int(b), int(e), int(s))
              for b, e, s in zip(begin, end, strides))
  return x[idx]


@register('SPLIT')
def split(ctx: OpContext, axis, x):
  n = int(ctx.attrs.get('num_splits', len(ctx.op.outputs)))
  ax = int(np.asarray(axis)) if not isinstance(axis, int) else axis
  return tuple(jnp.split(x, n, axis=ax))


@register('PAD')
def pad(ctx: OpContext, x, paddings=None):
  p = np.asarray(ctx.attrs.get('paddings', paddings)).astype(int)
  return jnp.pad(x, [(int(a), int(b)) for a, b in p])


@register('PADV2')
def padv2(ctx: OpContext, x, paddings=None, constant=None):
  p = np.asarray(ctx.attrs.get('paddings', paddings)).astype(int)
  cval = constant if constant is not None else ctx.attrs.get('constant', 0.0)
  cval = jnp.asarray(cval).reshape(())
  return jnp.pad(x, [(int(a), int(b)) for a, b in p],
                 constant_values=cval)


@register('MIRROR_PAD')
def mirror_pad(ctx: OpContext, x, paddings=None):
  p = np.asarray(ctx.attrs.get('paddings', paddings)).astype(int)
  mode = ctx.attrs.get('mode', 'REFLECT').lower()
  return jnp.pad(x, [(int(a), int(b)) for a, b in p], mode=mode)


@register('GATHER')
def gather(ctx: OpContext, x, indices):
  return jnp.take(x, indices.astype(jnp.int32),
                  axis=int(ctx.attrs.get('axis', 0)))


@register('GATHER_ND')
def gather_nd(ctx: OpContext, x, indices):
  idx = indices.astype(jnp.int32)
  return x[tuple(jnp.moveaxis(idx, -1, 0))]


@register('PACK')
def pack(ctx: OpContext, *xs):
  return jnp.stack(xs, axis=int(ctx.attrs.get('axis', 0)))


@register('UNPACK')
def unpack(ctx: OpContext, x):
  ax = int(ctx.attrs.get('axis', 0))
  n = x.shape[ax]
  parts = jnp.split(x, n, axis=ax)
  return tuple(jnp.squeeze(p, axis=ax) for p in parts)


@register('BROADCAST_TO')
def broadcast_to(ctx: OpContext, x, shape=None):
  return jnp.broadcast_to(x, ctx.out_tensor(0).shape)


@register('DYNAMIC_UPDATE_SLICE')
def dynamic_update_slice(ctx: OpContext, operand, update, start_indices):
  starts = [start_indices[i].astype(jnp.int32)
            for i in range(operand.ndim)]
  return jax.lax.dynamic_update_slice(operand, update.astype(operand.dtype),
                                      starts)


# -- elementwise ------------------------------------------------------------


def _register_binary(name: str, fn):
  @register(name)
  def _impl(ctx: OpContext, a, b, _fn=fn):
    return _fn(a, b)


_register_binary('ADD', jnp.add)
_register_binary('SUB', jnp.subtract)
_register_binary('MUL', jnp.multiply)
_register_binary('DIV', jnp.divide)
_register_binary('MAXIMUM', jnp.maximum)
_register_binary('SQUARED_DIFFERENCE', lambda a, b: jnp.square(a - b))
_register_binary('EQUAL', lambda a, b: jnp.equal(a, b))
_register_binary('NOT_EQUAL', lambda a, b: jnp.not_equal(a, b))
_register_binary('MINIMUM', jnp.minimum)
_register_binary('LESS', lambda a, b: jnp.less(a, b))
_register_binary('LESS_EQUAL', lambda a, b: jnp.less_equal(a, b))
_register_binary('GREATER', lambda a, b: jnp.greater(a, b))
_register_binary('GREATER_EQUAL', lambda a, b: jnp.greater_equal(a, b))
_register_binary('LOGICAL_AND', jnp.logical_and)
_register_binary('LOGICAL_OR', jnp.logical_or)
_register_binary('POW', jnp.power)
_register_binary('FLOOR_DIV', jnp.floor_divide)
_register_binary('FLOOR_MOD', jnp.mod)


@register('CAST')
def cast(ctx: OpContext, x):
  out_dtype = ctx.subgraph.tensors[ctx.op.outputs[0]].dtype
  if out_dtype in ('int4', 'int2'):  # sub-byte logical types: int8 container
    out_dtype = 'int8'
  return x.astype(jnp.dtype(out_dtype))


def _register_unary(name: str, fn):
  @register(name)
  def _impl(ctx: OpContext, x, _fn=fn):
    return _fn(x)


_register_unary('RELU', jax.nn.relu)
_register_unary('TANH', jnp.tanh)
_register_unary('LOGISTIC', jax.nn.sigmoid)
_register_unary('RSQRT', jax.lax.rsqrt)
_register_unary('SQRT', jnp.sqrt)
_register_unary('SIN', jnp.sin)  # RoPE tables (ref toy gemma kv-cache model)
_register_unary('COS', jnp.cos)
_register_unary('HARD_SWISH', lambda x: x * jnp.clip(x + 3.0, 0, 6.0) / 6.0)


@register('GELU')
def gelu(ctx: OpContext, x):
  return jax.nn.gelu(x, approximate=bool(ctx.attrs.get('approximate', True)))


@register('SOFTMAX')
def softmax(ctx: OpContext, x):
  beta = float(ctx.attrs.get('beta', 1.0))
  return jax.nn.softmax(beta * x, axis=-1)


@register('ARG_MAX')
def arg_max(ctx: OpContext, x, axis=None):
  ax = int(ctx.attrs.get('axis', -1 if axis is None else axis))
  return jnp.argmax(x, axis=ax).astype(jnp.int32)


@register('MEAN')
def mean(ctx: OpContext, x, axis=None):
  ax = ctx.attrs.get('axis', axis)
  ax = tuple(np.asarray(ax).reshape(-1).tolist()) if ax is not None else None
  return jnp.mean(x, axis=ax,
                  keepdims=bool(ctx.attrs.get('keep_dims', False)))


@register('SUM')
def sum_op(ctx: OpContext, x, axis=None):
  ax = ctx.attrs.get('axis', axis)
  ax = tuple(np.asarray(ax).reshape(-1).tolist()) if ax is not None else None
  return jnp.sum(x, axis=ax,
                 keepdims=bool(ctx.attrs.get('keep_dims', False)))


@register('REDUCE_MIN')
def reduce_min(ctx: OpContext, x, axis=None):
  ax = ctx.attrs.get('axis', axis)
  ax = tuple(np.asarray(ax).reshape(-1).tolist()) if ax is not None else None
  return jnp.min(x, axis=ax,
                 keepdims=bool(ctx.attrs.get('keep_dims', False)))


@register('SELECT')
def select(ctx: OpContext, cond, a, b):
  return jnp.where(cond, a, b)


@register('SELECT_V2')
def select_v2(ctx: OpContext, cond, a, b):
  return jnp.where(cond, a, b)


# -- transformer ops (TPU-side additions) -----------------------------------


@register('RMS_NORM')
def rms_norm(ctx: OpContext, x, gamma=None):
  eps = float(ctx.attrs.get('epsilon', 1e-6))
  var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
  y = x * jax.lax.rsqrt(var + eps).astype(x.dtype)
  if gamma is not None:
    y = y * gamma
  return y


@register('ROPE')
def rope(ctx: OpContext, x, positions):
  """Rotary position embedding over the last dim (half-split convention)."""
  base = float(ctx.attrs.get('rope_base', 10000.0))
  head_dim = x.shape[-1]
  half = head_dim // 2
  freqs = base ** (-np.arange(0, half, dtype=np.float32) / half)
  angles = positions[..., None].astype(jnp.float32) * freqs  # [..., half]
  sin, cos = jnp.sin(angles), jnp.cos(angles)
  # x shape [..., seq, heads, head_dim]; positions [..., seq].
  sin = sin[..., None, :]
  cos = cos[..., None, :]
  x1, x2 = x[..., :half], x[..., half:]
  return jnp.concatenate(
      [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


@register('HADAMARD_ROTATION')
def hadamard_rotation(ctx: OpContext, x):
  """Block-diagonal normalized Hadamard rotation of the last dimension."""
  hsize = int(ctx.attrs['hadamard_size'])
  h = _normalized_hadamard_jnp(hsize)
  shape = x.shape
  blocks = shape[-1] // hsize
  xr = x.reshape(shape[:-1] + (blocks, hsize))
  y = jnp.einsum('...bi,ij->...bj', xr, h,
                 preferred_element_type=jnp.float32).astype(x.dtype)
  return y.reshape(shape)


def _normalized_hadamard_jnp(size: int):
  h = np.array([[1.0]], dtype=np.float32)
  while h.shape[0] < size:
    h = np.block([[h, h], [h, -h]])
  return jnp.asarray(h / np.sqrt(size), dtype=jnp.float32)


@register('STABLEHLO_COMPOSITE')
def stablehlo_composite(ctx: OpContext, *xs):
  raise NotImplementedError(
      'Composite ops are executed via their side-effect subgraphs by the '
      'executor, not via a direct impl.')


# -- jax-importer primitive ops (float-only vocabulary extension) -----------

_register_unary('EXP', jnp.exp)
_register_unary('LOG', jnp.log)
_register_unary('NEG', jnp.negative)
_register_unary('ABS', jnp.abs)
_register_unary('SIGN', jnp.sign)
_register_unary('FLOOR', jnp.floor)
_register_unary('ERF', jax.scipy.special.erf)
_register_unary('IDENTITY', lambda x: x)
_register_binary('POW', jnp.power)


@register('INTEGER_POW')
def integer_pow(ctx: OpContext, x):
  return x ** int(ctx.attrs['exponent'])


@register('SELECT_N')
def select_n(ctx: OpContext, which, *cases):
  if len(cases) == 2:
    return jnp.where(which.astype(bool), cases[1], cases[0])
  idx = which.astype(jnp.int32)
  out = cases[0]
  for i, c in enumerate(cases[1:], start=1):
    out = jnp.where(idx == i, c, out)
  return out


@register('BROADCAST_IN_DIM')
def broadcast_in_dim(ctx: OpContext, x):
  return jax.lax.broadcast_in_dim(
      x, tuple(ctx.attrs['shape']),
      tuple(ctx.attrs['broadcast_dimensions']))


@register('REDUCE_MAX')
def reduce_max(ctx: OpContext, x, axis=None):
  ax = ctx.attrs.get('axis', axis)
  ax = tuple(np.asarray(ax).reshape(-1).tolist()) if ax is not None else None
  return jnp.max(x, axis=ax,
                 keepdims=bool(ctx.attrs.get('keep_dims', False)))


@register('INT4G_ATTENTION')
def int4g_attention(ctx: OpContext, q, k_rows, v_rows, k_cache, v_cache,
                    sidecar, cache_pos):
  """Fused int4-per-group KV-cache decode attention (serving custom op).

  The builder (models/gemma.py, kv_int4_group) emits this single op in
  place of the float DUS + BMM/softmax chain when the serving KV cache is
  int4 with per-group-16 sidecar scales (asymmetric K, symmetric V):

    q        [B, NK, G, H]   post-RoPE grouped queries (T == 1)
    k_rows   [B, NK, 1, H]   this step's post-RoPE K row (float)
    v_rows   [B, NK, 1, H]   this step's V row (float)
    k_cache  [B, NK, S, H/2] packed unsigned K codes
    v_cache  [B, NK, S, H/2] packed signed V codes
    sidecar  [B, NK, 3*H/g, S] bf16 per-group stats (S minor)
    cache_pos [4]            DUS start vector; [2] is the write position

  Outputs: (ctx [B, NK, G, H], k_cache', v_cache', sidecar').
  Quantize-new-rows -> DUS write -> kernel read over lengths = pos + 1;
  exact numerics of kernels/pallas_attention.decode_attention_int4_group.
  """
  from ai_edge_quantizer_tpu.kernels import pallas_attention as pa

  group = int(ctx.attrs.get('group', 16))
  b, nk, g, h = q.shape
  assert k_rows.shape[2] == 1, 'int4g attention is decode-shaped (T=1)'
  ng = h // group
  pos = cache_pos[2].astype(jnp.int32)

  kp_new, ks, km = pa.quantize_k_rows_int4_asym(k_rows, group)
  vp_new, vs = pa.quantize_v_rows_int4_group(v_rows, group)
  zero = jnp.int32(0)
  k_cache2 = jax.lax.dynamic_update_slice(
      k_cache, kp_new.astype(k_cache.dtype), (zero, zero, pos, zero))
  v_cache2 = jax.lax.dynamic_update_slice(
      v_cache, vp_new.astype(v_cache.dtype), (zero, zero, pos, zero))
  # Sidecar column update: stats for the new row land at [:, :, :, pos].
  col = jnp.concatenate([ks, km, vs], axis=-1)        # [B, NK, 1, 3NG]
  col = jnp.swapaxes(col, -1, -2).astype(sidecar.dtype)  # [B, NK, 3NG, 1]
  sidecar2 = jax.lax.dynamic_update_slice(
      sidecar, col, (zero, zero, zero, pos))
  lengths = jnp.full((b,), pos + 1, jnp.int32)
  import os as _os
  out = pa.decode_attention_int4_group_lengths(
      q.astype(jnp.float32), k_cache2, v_cache2, sidecar2, lengths,
      group=group, out_dtype=q.dtype,
      batch_block=int(_os.environ.get('AEQT_ATTN_BB', '4')),
      interpret=jax.default_backend() != 'tpu')
  return out, k_cache2, v_cache2, sidecar2


@register('INT4G_ATTENTION_SCATTER')
def int4g_attention_scatter(ctx: OpContext, q, k_rows, v_rows, k_cache,
                            v_cache, sidecar, positions):
  """Continuous-batching variant of INT4G_ATTENTION: per-row positions.

  positions [B, 1] int32 — each slot writes its new K/V row (and sidecar
  column) at its OWN cache position, via a one-hot select over S (the
  packed analog of the float onehot cache blend, models/gemma.py); the
  kernel then masks per-row lengths = positions + 1.
  """
  from ai_edge_quantizer_tpu.kernels import pallas_attention as pa

  group = int(ctx.attrs.get('group', 16))
  b, nk, g, h = q.shape
  s = k_cache.shape[2]
  assert k_rows.shape[2] == 1, 'scatter attention is decode-shaped (T=1)'
  pos = positions.reshape(b).astype(jnp.int32)                # [B]

  kp_new, ks, km = pa.quantize_k_rows_int4_asym(k_rows, group)
  vp_new, vs = pa.quantize_v_rows_int4_group(v_rows, group)
  hit = (jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
         == pos[:, None])                                     # [B, S]
  hit_rows = hit[:, None, :, None]                            # [B,1,S,1]
  k_cache2 = jnp.where(hit_rows, kp_new.astype(k_cache.dtype), k_cache)
  v_cache2 = jnp.where(hit_rows, vp_new.astype(v_cache.dtype), v_cache)
  col = jnp.concatenate([ks, km, vs], axis=-1)                # [B,NK,1,3NG]
  col = jnp.swapaxes(col, -1, -2).astype(sidecar.dtype)       # [B,NK,3NG,1]
  sidecar2 = jnp.where(hit[:, None, None, :], col, sidecar)
  lengths = pos + 1
  import os as _os
  out = pa.decode_attention_int4_group_lengths(
      q.astype(jnp.float32), k_cache2, v_cache2, sidecar2, lengths,
      group=group, out_dtype=q.dtype,
      batch_block=int(_os.environ.get('AEQT_ATTN_BB', '4')),
      interpret=jax.default_backend() != 'tpu')
  return out, k_cache2, v_cache2, sidecar2
