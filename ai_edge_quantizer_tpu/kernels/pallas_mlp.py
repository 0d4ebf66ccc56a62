"""Pallas TPU megakernel: the whole GeGLU MLP block in ONE kernel call.

gate_up projection -> GELU(gate) * up -> down projection, with packed
int4 weights, executed as a single pallas_call:

  * The hidden activation ([M, F], the largest intermediate of a decode
    step: 8 MiB/layer at B=256, F=16384) NEVER touches HBM — each F-tile
    of it is produced, activated, and immediately contracted against the
    matching column group of the down weight, accumulating into a
    VMEM-resident [M, D] f32 accumulator.
  * All three contractions run int8 x int8 on the MXU (2x the bf16 MXU
    rate): x quantizes per row once on the first grid step (the
    reference's DRQ semantics — dynamic per-row activation scales), and
    each hidden tile quantizes per (row, tile) — a FINER granularity
    than per-row DRQ, so accuracy is at least as good.
  * One kernel launch replaces two matmul launches plus the XLA
    elementwise chain (slice/gelu/mul) between them.

Layouts:
  * gate_up weight: standard split-half packed bytes [2F, D//2]
    (kernels/pallas_qmatmul.pack_int4_split); rows [0, F) = gate,
    [F, 2F) = up — the same array serves both via two block specs.
  * down weight: GROUP-split packing (pack_int4_split_grouped): the
    split-half byte layout applied per F-tile column group, so the grid
    step for tile t streams exactly the bytes of columns
    [t*BF, (t+1)*BF) — each down-weight byte is fetched once.

Reference parity: this fuses the reference's FULLY_CONNECTED ->
(SLICE, SLICE) -> GELU -> MUL -> FULLY_CONNECTED subgraph (the GeGLU FFN
in its GenAI models); numerics match the unfused DRQ path up to the
per-tile (vs whole-row) hidden activation scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ai_edge_quantizer_tpu.kernels.pallas_qmatmul import (
    _round_up,
    pack_int4_split,
    unpack_int4_split,
)


def pack_int4_split_grouped(w_q: jax.Array, group: int) -> jax.Array:
  """Per-group split-half int4 packing: [N, K] int8 -> [N, K//2] uint8.

  Applies pack_int4_split independently to each column group of `group`
  columns: byte (g, j) holds (w[:, g*group + j] & 0xF) |
  (w[:, g*group + group//2 + j] << 4). A kernel that tiles K by `group`
  streams contiguous bytes per tile with no interleave on unpack.
  """
  n, k = w_q.shape
  if k % group or group % 2:
    raise ValueError(f'group {group} must be even and divide K={k}.')
  wg = w_q.reshape(n, k // group, group)
  lo = wg[:, :, : group // 2].astype(jnp.uint8) & 0xF
  hi = wg[:, :, group // 2:].astype(jnp.uint8) & 0xF
  return (lo | (hi << 4)).reshape(n, k // 2).astype(jnp.uint8)


def unpack_int4_split_grouped(packed: jax.Array, group: int) -> jax.Array:
  """Inverse of pack_int4_split_grouped (validation / capture view)."""
  n, k2 = packed.shape
  g2 = group // 2
  p = packed.reshape(n, k2 // g2, g2)
  lo = (p & 0xF).astype(jnp.int8)
  hi = (p >> 4).astype(jnp.int8)
  lo = jnp.where(lo >= 8, lo - 16, lo)
  hi = jnp.where(hi >= 8, hi - 16, hi)
  return jnp.concatenate([lo, hi], axis=2).reshape(n, 2 * k2)


def _gelu_tanh(x):
  # jax.nn.gelu(approximate=True) numerics (ops/impl.py GELU).
  c = 0.7978845608028654  # sqrt(2/pi)
  return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _act_fn(kind: str):
  if kind == 'gelu':
    return _gelu_tanh
  if kind == 'silu':
    return lambda x: x * jax.nn.sigmoid(x)
  raise ValueError(f'unsupported mlp activation {kind!r}')


def _mlp_drq_kernel(ngroups, bf, act, x_ref, wg_ref, wu_ref, sg_ref,
                    su_ref, wd_ref, sd_ref, o_ref, acc_ref, xq_ref,
                    xs_ref):
  t = pl.program_id(1)
  act_f = _act_fn(act)

  @pl.when(t == 0)
  def _():
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-9) * (1.0 / 127.0)
    xs_ref[:] = xs
    xq_ref[:] = jnp.round(x * pl.reciprocal(xs, approx=False)).astype(
        jnp.int8)
    acc_ref[:] = jnp.zeros_like(acc_ref)

  def unpack(ref):
    w32 = ref[:].astype(jnp.int32)
    return ((((w32 & 0xF) ^ 8) - 8).astype(jnp.int8),
            (((w32 >> 4) ^ 8) - 8).astype(jnp.int8))

  def proj(w_ref_, s_ref_):
    lo, hi = unpack(w_ref_)                      # [BF, D/2] each
    d2 = lo.shape[1]
    acc = jax.lax.dot_general(
        xq_ref[:, :d2], lo, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(
        xq_ref[:, d2:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs_ref[:] * s_ref_[:]

  gate = proj(wg_ref, sg_ref)                    # [M, BF] f32
  up = proj(wu_ref, su_ref)
  h = act_f(gate) * up                           # [M, BF] f32

  # Per-(row, tile) hidden quantization: finer than per-row DRQ.
  habs = jnp.max(jnp.abs(h), axis=1, keepdims=True)
  hs = jnp.maximum(habs, 1e-9) * (1.0 / 127.0)
  hq = jnp.round(h * pl.reciprocal(hs, approx=False)).astype(jnp.int8)

  dlo, dhi = unpack(wd_ref)                      # [D, BF/2] each
  b2 = bf // 2
  part = jax.lax.dot_general(
      hq[:, :b2], dlo, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32)
  part += jax.lax.dot_general(
      hq[:, b2:], dhi, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32)
  acc_ref[:] += part.astype(jnp.float32) * hs

  @pl.when(t == ngroups - 1)
  def _():
    o_ref[:] = (acc_ref[:] * sd_ref[:]).astype(o_ref.dtype)


def _mlp_bf16_kernel(ngroups, bf, act, x_ref, wg_ref, wu_ref, sg_ref,
                     su_ref, wd_ref, sd_ref, o_ref, acc_ref):
  """Float-compute twin (weight-only numerics; no activation quant)."""
  t = pl.program_id(1)
  act_f = _act_fn(act)
  compute = x_ref.dtype

  @pl.when(t == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  def unpack(ref):
    w32 = ref[:].astype(jnp.int32)
    return ((((w32 & 0xF) ^ 8) - 8).astype(compute),
            (((w32 >> 4) ^ 8) - 8).astype(compute))

  x = x_ref[:]

  def proj(w_ref_, s_ref_):
    lo, hi = unpack(w_ref_)
    d2 = lo.shape[1]
    acc = jax.lax.dot_general(
        x[:, :d2], lo, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        x[:, d2:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc * s_ref_[:]

  gate = proj(wg_ref, sg_ref)
  up = proj(wu_ref, su_ref)
  h = (act_f(gate) * up).astype(compute)

  dlo, dhi = unpack(wd_ref)
  b2 = bf // 2
  part = jax.lax.dot_general(
      h[:, :b2], dlo, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  part += jax.lax.dot_general(
      h[:, b2:], dhi, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  acc_ref[:] += part

  @pl.when(t == ngroups - 1)
  def _():
    o_ref[:] = (acc_ref[:] * sd_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=('act', 'drq', 'bf', 'interpret'))
def mlp_pallas_int4_packed(
    x: jax.Array,
    wgu_packed: jax.Array,
    s_gu: jax.Array,
    wd_grouped: jax.Array,
    s_d: jax.Array,
    act: str = 'gelu',
    drq: bool = True,
    bf: int = 512,
    interpret: bool = False,
) -> jax.Array:
  """down(act(gate) * up) for packed int4 weights, one kernel call.

  x [..., D]; wgu_packed [2F, D//2] (pack_int4_split; gate rows then up
  rows); s_gu [2F]; wd_grouped [D, F//2] (pack_int4_split_grouped with
  group=bf); s_d [D]. Returns [..., D] in x.dtype.
  """
  two_f, d2 = wgu_packed.shape
  d = d2 * 2
  f = two_f // 2
  if f % bf:
    raise ValueError(f'bf={bf} must divide F={f}.')
  ngroups = f // bf
  lead_shape = x.shape[:-1]
  m = 1
  for dim in lead_shape:
    m *= dim
  compute = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
  x2 = x.reshape(m, d).astype(compute)
  sublane = 32 if drq else (16 if compute == jnp.bfloat16 else 8)
  m_pad = _round_up(max(m, sublane), sublane)
  # M-blocked: keep the VMEM-resident x/acc/hidden tiles bounded (an
  # unblocked M=1024 prefill pass exceeded the 16 MB scoped limit by
  # 5 MB). bm=256 is the measured decode sweet spot and fits.
  bm = min(m_pad, 256)
  m_pad = _round_up(m_pad, bm)
  m_tiles = m_pad // bm
  if m_pad != m:
    x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

  sgu2 = s_gu.astype(jnp.float32).reshape(1, two_f)
  sd2 = s_d.astype(jnp.float32).reshape(1, d)
  operands = [x2, wgu_packed, wgu_packed, sgu2, sgu2, wd_grouped, sd2]
  # Grid (m_tiles, ngroups): F-groups iterate innermost, so the per-tile
  # accumulator/xq scratch persists across a row-tile's F sweep.
  in_specs = [
      pl.BlockSpec((bm, d), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
      # gate rows [t*bf, (t+1)*bf)
      pl.BlockSpec((bf, d2), lambda i, t: (t, 0), memory_space=pltpu.VMEM),
      # up rows [F + t*bf, ...): block index ngroups + t
      pl.BlockSpec((bf, d2), lambda i, t: (ngroups + t, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, bf), lambda i, t: (0, t), memory_space=pltpu.VMEM),
      pl.BlockSpec((1, bf), lambda i, t: (0, ngroups + t),
                   memory_space=pltpu.VMEM),
      # down column group t (grouped packing: contiguous bytes)
      pl.BlockSpec((d, bf // 2), lambda i, t: (0, t),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, d), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
  ]
  scratch = [pltpu.VMEM((bm, d), jnp.float32)]
  if drq:
    kernel = functools.partial(_mlp_drq_kernel, ngroups, bf, act)
    scratch += [pltpu.VMEM((bm, d), jnp.int8),
                pltpu.VMEM((bm, 1), jnp.float32)]
  else:
    kernel = functools.partial(_mlp_bf16_kernel, ngroups, bf, act)
  flops = 2 * m_pad * f * d * 3
  out = pl.pallas_call(
      kernel,
      grid=(m_tiles, ngroups),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((bm, d), lambda i, t: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((m_pad, d), compute),
      scratch_shapes=scratch,
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel', 'arbitrary')),
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=m_pad * d * 4 + m_tiles * (two_f * d2 + d * f // 2),
          transcendentals=m_pad * f),
      interpret=interpret,
  )(*operands)
  return out[:m].reshape(lead_shape + (d,)).astype(x.dtype)


def mlp_reference(x, w_gate, w_up, w_down, s_gate, s_up, s_down,
                  act: str = 'gelu'):
  """XLA twin on unpacked int8-container int4 weights (tests)."""
  act_f = _act_fn(act)
  xf = x.astype(jnp.float32)
  gate = xf @ (w_gate.astype(jnp.float32) * s_gate[:, None]).T
  up = xf @ (w_up.astype(jnp.float32) * s_up[:, None]).T
  h = act_f(gate) * up
  return (h @ (w_down.astype(jnp.float32) * s_down[:, None]).T).astype(
      x.dtype)
