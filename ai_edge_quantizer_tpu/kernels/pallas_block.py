"""Fused decode-block megakernel: MLP(l-1) + norms + QKV(l) + RoPE +
attention(l) in ONE pallas_call, with the attention cache DMA streamed
DURING the MLP's MXU phase.

Why: in the per-kernel decode step the attention kernel is DMA-bound
(its MXU is idle) while the MLP kernel is MXU-bound (its DMA engine is
~40% busy on weight streams) — but TPU kernels serialize, so neither
hides the other. Merging the units that the data dependencies allow
(attention(l) needs QKV(l) needs MLP(l-1): the cache operand of
attention(l) is the ONLY large input that depends on nothing in the
unit) lets the kernel issue the layer-l cache copies into a VMEM ring at
grid step 0 and consume them after the MLP/QKV compute, so the step
approaches max(total DMA, total MXU) instead of their sum. Requires the
scoped-VMEM limit raised past 16 MiB (pass
compiler_options={'xla_tpu_scoped_vmem_limit_kib': ...} on the enclosing
jit; v5e has 128 MiB physical VMEM).

Semantics (exact twins of the unfused ops):
  x_ffn   = x_res + down(act(gate(h1)) * up(h1)),  h1 = rmsnorm(x_res)*g1
  qkv     = rmsnorm(x_ffn)*g2 @ Wqkv^T              (packed int4, DRQ)
  q, k    = rope(qkv slices); v = qkv slice
  k_new   = quantize_int8(k);  v_new = quantize_int8(v)
  ctx     = stale-cache attention (pre-write cache + inline current
            column; numerics of pallas_attention._ctx_prefix_len_cur)

The cache DUS of (k_new, v_new) runs OUTSIDE in XLA, off the attention
critical path (stale-mode contract, pallas_attention.py
decode_attention_int8_lengths_stale).

Reference parity anchor: this fuses the reference graph chain
RMS_NORM -> FC -> (GELU, MUL) -> FC -> ADD -> RMS_NORM -> FC -> ROPE ->
DYNAMIC_UPDATE_SLICE -> BMM -> SOFTMAX -> BMM (the GenAI decoder layer in
/root/reference's toy Gemma fixtures); numerics match the repo's unfused
executor path up to DRQ activation-quantization granularity.

Restrictions (bench/serving shape): NK == 1 (MQA), decode T == 1, one
shared write position for the step, per-tensor int8 KV scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ai_edge_quantizer_tpu.kernels.pallas_attention import (
    _ctx_prefix_len_cur,
)
from ai_edge_quantizer_tpu.kernels.pallas_mlp import _act_fn


def _rmsnorm_quant(x, gamma, eps):
  """f32 rmsnorm -> per-row int8 DRQ quantization: (xq, xs)."""
  var = jnp.mean(jnp.square(x), axis=1, keepdims=True)
  xn = x * jax.lax.rsqrt(var + eps) * gamma
  absmax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
  xs = jnp.maximum(absmax, 1e-9) * (1.0 / 127.0)
  xq = jnp.round(xn * pl.reciprocal(xs, approx=False)).astype(jnp.int8)
  return xq, xs


def _unpack(ref_or_arr):
  w32 = ref_or_arr[:].astype(jnp.int32)
  return ((((w32 & 0xF) ^ 8) - 8).astype(jnp.int8),
          (((w32 >> 4) ^ 8) - 8).astype(jnp.int8))


def _packed_dot(xq, xs, w_ref, s_row):
  """[M, K] int8 DRQ x split-half packed [N, K//2] -> [M, N] f32."""
  lo, hi = _unpack(w_ref)
  k2 = lo.shape[1]
  acc = jax.lax.dot_general(
      xq[:, :k2], lo, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32)
  acc += jax.lax.dot_general(
      xq[:, k2:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32)
  return acc.astype(jnp.float32) * xs * s_row


def _rope_rotate(x, cos, sin, h):
  """Half-split RoPE on [B, H] rows (cos/sin [B, H//2])."""
  half = h // 2
  x1, x2 = x[:, :half], x[:, half:]
  return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                         axis=1)


@functools.partial(
    jax.jit,
    static_argnames=('num_q_heads', 'k_scale_eff', 'v_scale', 'kq_scale',
                     'vq_scale', 'k_zero_point', 'v_zero_point', 'act',
                     'eps', 'compute', 'bf', 'bb', 'ring', 'writeback',
                     'interpret'))
def fused_mlp_qkv_attention(
    x_res: jax.Array,        # [B, D] residual entering the FFN of l-1
    gamma_ffn: jax.Array,    # [D]
    wgu_packed: jax.Array,   # [2F, D//2] u8 split-half packed
    s_gu: jax.Array,         # [2F]
    wd_grouped: jax.Array,   # [D, F//2] u8 grouped packing (group=bf)
    s_d: jax.Array,          # [D]
    gamma_attn: jax.Array,   # [D]
    wqkv_packed: jax.Array,  # [(NQ+2)*H, D//2] u8
    s_qkv: jax.Array,        # [(NQ+2)*H]
    rope_cos: jax.Array,     # [B, H//2] per-row cos(pos * freqs)
    rope_sin: jax.Array,     # [B, H//2]
    k_cache: jax.Array,      # [B, S, H] int8 (PRE-write, NK == 1)
    v_cache: jax.Array,      # [B, S, H] int8
    lengths: jax.Array,      # [B] int32, counting the current token
    pos: jax.Array,          # [] int32 shared write position (= len-1)
    k_scale_eff: float,      # score-side K scale (x graph scale factor)
    v_scale: float,
    kq_scale: float,         # new-row quantization scales (cache params)
    vq_scale: float,
    num_q_heads: int,
    k_zero_point: float = 0.0,
    v_zero_point: float = 0.0,
    act: str = 'gelu',
    eps: float = 1e-6,
    compute: str = 'f32',
    bf: int = 2048,
    bb: int = 8,
    ring: int = 8,
    writeback: bool = True,
    interpret: bool = False,
):
  """Returns (ctx [B, NQ, H] f32, x_ffn [B, D], k_new [B, H] i8,
  v_new [B, H] i8, k_pool, v_pool).

  writeback=True: the cache pools come back as ALIASED outputs with row
  `pos` updated in-kernel — the spliced 32-row dirty tile DMAs back to
  HBM from the ring buffer during the attention sweep, so no XLA DUS
  (and none of its VMEM staging) remains in the step. writeback=False
  returns the pools untouched (caller performs the DUS)."""
  b, d = x_res.shape
  two_f = wgu_packed.shape[0]
  f = two_f // 2
  nq = num_q_heads
  h = (wqkv_packed.shape[0]) // (nq + 2)
  s = k_cache.shape[1]
  if f % bf:
    raise ValueError(f'bf={bf} must divide F={f}.')
  n_f = f // bf
  while b % bb:
    bb //= 2
  n_attn = b // bb
  ring = max(1, min(ring, n_attn))

  scales = jnp.stack([
      jnp.float32(k_scale_eff), jnp.float32(v_scale),
      jnp.float32(k_zero_point), jnp.float32(v_zero_point),
      jnp.float32(1.0 / kq_scale), jnp.float32(1.0 / vq_scale)]
      ).reshape(1, 6)
  lens = lengths.astype(jnp.int32)
  pos_arr = jnp.clip(jnp.asarray(pos, jnp.int32).reshape(1), 0, s - 1)

  grid = (n_f + n_attn,)

  def clip_f(t):
    return jnp.minimum(t, n_f - 1)

  kernel = functools.partial(
      _kernel_impl, n_f, bf, n_attn, bb, ring, s, h, nq, act, eps,
      compute, writeback)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=grid,
      in_specs=[
          pl.BlockSpec((b, d), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # x
          pl.BlockSpec((1, d), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # g1
          pl.BlockSpec((bf, d // 2), lambda t, L, P: (clip_f(t), 0),
                       memory_space=pltpu.VMEM),                  # w gate
          pl.BlockSpec((bf, d // 2),
                       lambda t, L, P: (n_f + clip_f(t), 0),
                       memory_space=pltpu.VMEM),                  # w up
          pl.BlockSpec((1, bf), lambda t, L, P: (0, clip_f(t)),
                       memory_space=pltpu.VMEM),                  # s gate
          pl.BlockSpec((1, bf), lambda t, L, P: (0, n_f + clip_f(t)),
                       memory_space=pltpu.VMEM),                  # s up
          pl.BlockSpec((d, bf // 2), lambda t, L, P: (0, clip_f(t)),
                       memory_space=pltpu.VMEM),                  # w down
          pl.BlockSpec((1, d), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # s down
          pl.BlockSpec((1, d), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # g2
          pl.BlockSpec(((nq + 2) * h, d // 2), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # wqkv
          pl.BlockSpec((1, (nq + 2) * h), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # sqkv
          pl.BlockSpec((b, h // 2), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # cos
          pl.BlockSpec((b, h // 2), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # sin
          pl.BlockSpec((1, 6), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # scales
          pl.BlockSpec(memory_space=pl.ANY),                   # k_hbm
          pl.BlockSpec(memory_space=pl.ANY),                   # v_hbm
      ],
      out_specs=[
          pl.BlockSpec((bb, nq, h),
                       lambda t, L, P: (jnp.maximum(t - n_f, 0), 0, 0),
                       memory_space=pltpu.VMEM),                  # ctx
          pl.BlockSpec((b, d), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # x_ffn
          pl.BlockSpec((b, h), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # k_new
          pl.BlockSpec((b, h), lambda t, L, P: (0, 0),
                       memory_space=pltpu.VMEM),                  # v_new
          pl.BlockSpec(memory_space=pl.ANY),                     # k_pool
          pl.BlockSpec(memory_space=pl.ANY),                     # v_pool
      ],
      scratch_shapes=[
          pltpu.VMEM((b, d), jnp.float32),       # acc
          pltpu.VMEM((b, d), jnp.int8),          # xq
          pltpu.VMEM((b, 1), jnp.float32),       # xs
          pltpu.VMEM((b, nq, h), jnp.float32),   # q rotated
          pltpu.VMEM((b, h), jnp.int8),          # k_new scratch
          pltpu.VMEM((b, h), jnp.int8),          # v_new scratch
          pltpu.VMEM((ring, bb, s, h), jnp.int8),  # k ring
          pltpu.VMEM((ring, bb, s, h), jnp.int8),  # v ring
          pltpu.VMEM((2, bb, 32, h), jnp.int8),  # k write tiles
          pltpu.VMEM((2, bb, 32, h), jnp.int8),  # v write tiles
          pltpu.SemaphoreType.DMA((2 * ring,)),
          pltpu.SemaphoreType.DMA((4,)),         # write sems (2 par x 2)
      ],
  )
  outs = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((b, nq, h), jnp.float32),
          jax.ShapeDtypeStruct((b, d), x_res.dtype),
          jax.ShapeDtypeStruct((b, h), jnp.int8),
          jax.ShapeDtypeStruct((b, h), jnp.int8),
          jax.ShapeDtypeStruct((b, s, h), jnp.int8),
          jax.ShapeDtypeStruct((b, s, h), jnp.int8),
      ],
      # Operand indices count the 2 scalar-prefetch refs: k_cache is 16,
      # v_cache is 17; the pools alias in-place (their only consumer).
      input_output_aliases={16: 4, 17: 5},
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      cost_estimate=pl.CostEstimate(
          flops=2 * b * (3 * d * f + (nq + 2) * h * d)
          + 4 * b * nq * s * h,
          bytes_accessed=2 * b * s * h + two_f * d // 2 + d * f // 2,
          transcendentals=b * (f + nq * s)),
      interpret=interpret,
  )(lens, pos_arr, x_res, gamma_ffn.reshape(1, d), wgu_packed,
    wgu_packed,
    s_gu.astype(jnp.float32).reshape(1, two_f),
    s_gu.astype(jnp.float32).reshape(1, two_f), wd_grouped,
    s_d.astype(jnp.float32).reshape(1, d), gamma_attn.reshape(1, d),
    wqkv_packed,
    s_qkv.astype(jnp.float32).reshape(1, (nq + 2) * h),
    rope_cos.astype(jnp.float32), rope_sin.astype(jnp.float32), scales,
    k_cache, v_cache)
  return outs


def _kernel_impl(n_f, bf, n_attn, bb, ring, s, h, nq, act, eps, compute,
                 writeback,
                 lens_ref, pos_ref, x_ref, g1_ref, wg_ref, wu_ref, sg_ref,
                 su_ref, wd_ref, sd_ref, g2_ref, wqkv_ref, sqkv_ref,
                 cos_ref, sin_ref, scales_ref, k_hbm, v_hbm,
                 ctx_ref, xffn_ref, knew_ref, vnew_ref, kpool_ref,
                 vpool_ref,
                 acc_ref, xq_ref, xs_ref, q_scr, kn_scr, vn_scr,
                 kbuf, vbuf, kw_scr, vw_scr, sems, wsems):
  t = pl.program_id(0)
  act_f = _act_fn(act)

  def dma(slot, blk, hbm, buf, sem_off):
    return pltpu.make_async_copy(
        hbm.at[pl.ds(blk * bb, bb)], buf.at[slot],
        sems.at[slot + sem_off])

  def wdma(par, blk, t0, scr, pool_ref, sem_off):
    return pltpu.make_async_copy(
        scr.at[par],
        pool_ref.at[pl.ds(blk * bb, bb), pl.ds(t0, 32)],
        wsems.at[par + sem_off])

  @pl.when(t == 0)
  def _():
    for r in range(ring):
      if r < n_attn:
        dma(r, r, k_hbm, kbuf, 0).start()
        dma(r, r, v_hbm, vbuf, ring).start()
    x = x_ref[:].astype(jnp.float32)
    xq, xs = _rmsnorm_quant(x, g1_ref[:], eps)
    xq_ref[:] = xq
    xs_ref[:] = xs
    acc_ref[:] = jnp.zeros_like(acc_ref)

  @pl.when(t < n_f)
  def _():
    gate = _packed_dot(xq_ref[:], xs_ref[:], wg_ref, sg_ref[:])
    up = _packed_dot(xq_ref[:], xs_ref[:], wu_ref, su_ref[:])
    hid = act_f(gate) * up
    habs = jnp.max(jnp.abs(hid), axis=1, keepdims=True)
    hs = jnp.maximum(habs, 1e-9) * (1.0 / 127.0)
    hq = jnp.round(hid * pl.reciprocal(hs, approx=False)).astype(jnp.int8)
    dlo, dhi = _unpack(wd_ref)
    b2 = bf // 2
    part = jax.lax.dot_general(
        hq[:, :b2], dlo, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    part += jax.lax.dot_general(
        hq[:, b2:], dhi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += part.astype(jnp.float32) * hs

  @pl.when(t == n_f - 1)
  def _():
    x_ffn = x_ref[:].astype(jnp.float32) + acc_ref[:] * sd_ref[:]
    xffn_ref[:] = x_ffn.astype(xffn_ref.dtype)
    xq2, xs2 = _rmsnorm_quant(x_ffn, g2_ref[:], eps)
    qkv = _packed_dot(xq2, xs2, wqkv_ref, sqkv_ref[:])
    cos = cos_ref[:]
    sin = sin_ref[:]
    for n in range(nq):
      q_scr[:, n] = _rope_rotate(qkv[:, n * h:(n + 1) * h], cos, sin, h)
    k_rot = _rope_rotate(qkv[:, nq * h:(nq + 1) * h], cos, sin, h)
    v_cur = qkv[:, (nq + 1) * h:(nq + 2) * h]
    kq_inv = scales_ref[0, 4]  # 1/kq_scale (host-side inverse: Mosaic
    vq_inv = scales_ref[0, 5]  # has no scalar reciprocal lowering)
    # Narrow-range symmetric int8, matching quant_arith.quantize.
    k_q = jnp.clip(jnp.round(k_rot * kq_inv), -127, 127).astype(jnp.int8)
    v_q = jnp.clip(jnp.round(v_cur * vq_inv), -127, 127).astype(jnp.int8)
    kn_scr[:] = k_q
    vn_scr[:] = v_q
    knew_ref[:] = k_q
    vnew_ref[:] = v_q

  @pl.when(t >= n_f)
  def _():
    j = t - n_f
    slot = jax.lax.rem(j, ring)
    # Dynamic leading-axis ref indexing: same idiom as the dynlen
    # kernel's double-buffer (pallas_attention.py decode_attention_
    # int8_dynlen: k_buf[slot, j] with a traced slot).
    dma(slot, j, k_hbm, kbuf, 0).wait()
    dma(slot, j, v_hbm, vbuf, ring).wait()
    row0 = j * bb
    # Block loads at j*bb (provably 8-aligned for Mosaic); rows then
    # index statically.
    q_blk = q_scr[pl.ds(row0, bb)]
    kn_blk = kn_scr[pl.ds(row0, bb)]
    vn_blk = vn_scr[pl.ds(row0, bb)]
    for r in range(bb):
      ctx = _ctx_prefix_len_cur(
          compute, q_blk[r], kbuf[slot, r], vbuf[slot, r],
          kn_blk[r][None, :], vn_blk[r][None, :],
          lens_ref[row0 + r] - 1, scales_ref)
      ctx_ref[r] = ctx.astype(ctx_ref.dtype)
    nxt = j + ring

    @pl.when(nxt < n_attn)
    def _():
      dma(slot, nxt, k_hbm, kbuf, 0).start()
      dma(slot, nxt, v_hbm, vbuf, ring).start()

    if writeback:
      # Persist the dirty 32-row tile of this block's rows from the ring
      # buffer with row `pos` spliced in: the cache write rides the
      # attention sweep's DMA engine — no XLA DUS (or staging) remains.
      p = pos_ref[0]
      t0 = (p // 32) * 32
      rel = p - t0
      par = jax.lax.rem(j, 2)

      @pl.when(j >= 2)
      def _():
        wdma(par, j - 2, t0, kw_scr, kpool_ref, 0).wait()
        wdma(par, j - 2, t0, vw_scr, vpool_ref, 2).wait()

      rowi = jax.lax.broadcasted_iota(jnp.int32, (bb, 32, h), 1)
      k_tile = kbuf[slot, :, pl.ds(t0, 32)]
      v_tile = vbuf[slot, :, pl.ds(t0, 32)]
      kw_scr[par] = jnp.where(rowi == rel, kn_blk[:, None, :], k_tile)
      vw_scr[par] = jnp.where(rowi == rel, vn_blk[:, None, :], v_tile)
      wdma(par, j, t0, kw_scr, kpool_ref, 0).start()
      wdma(par, j, t0, vw_scr, vpool_ref, 2).start()

      @pl.when(j == n_attn - 1)
      def _():
        wdma(par, j, t0, kw_scr, kpool_ref, 0).wait()
        wdma(par, j, t0, vw_scr, vpool_ref, 2).wait()
        if n_attn >= 2:
          wdma(1 - par, j - 1, t0, kw_scr, kpool_ref, 0).wait()
          wdma(1 - par, j - 1, t0, vw_scr, vpool_ref, 2).wait()
