"""Fused decode-block megakernel vs the unfused composition (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_edge_quantizer_tpu.kernels import pallas_attention, pallas_block
from ai_edge_quantizer_tpu.kernels import pallas_mlp, pallas_qmatmul

B, D, F, NQ, H, S = 16, 256, 512, 4, 128, 64
BF, BB, RING = 256, 4, 2
EPS = 1e-6
KS, VS = 0.061, 0.059     # score-side scales
KQS, VQS = 0.061, 0.059   # new-row quantization scales


def _mk():
  rng = np.random.default_rng(0)
  x = rng.standard_normal((B, D)).astype(np.float32) * 0.5
  g1 = (rng.random(D) * 0.2 + 0.9).astype(np.float32)
  g2 = (rng.random(D) * 0.2 + 0.9).astype(np.float32)
  wgu = rng.integers(-7, 8, (2 * F, D)).astype(np.int8)
  sgu = (rng.random(2 * F) * 0.01 + 0.005).astype(np.float32)
  wd = rng.integers(-7, 8, (D, F)).astype(np.int8)
  sd = (rng.random(D) * 0.01 + 0.005).astype(np.float32)
  wqkv = rng.integers(-7, 8, ((NQ + 2) * H, D)).astype(np.int8)
  sqkv = (rng.random((NQ + 2) * H) * 0.01 + 0.005).astype(np.float32)
  pos = 37
  kc = rng.integers(-127, 128, (B, S, H)).astype(np.int8)
  vc = rng.integers(-127, 128, (B, S, H)).astype(np.int8)
  kc[:, pos:] = 0
  vc[:, pos:] = 0
  lengths = np.full(B, pos + 1, np.int32)
  half = H // 2
  freqs = 10000.0 ** (-np.arange(0, half, dtype=np.float32) / half)
  ang = pos * freqs
  cos = np.broadcast_to(np.cos(ang), (B, half)).astype(np.float32)
  sin = np.broadcast_to(np.sin(ang), (B, half)).astype(np.float32)
  return (x, g1, g2, wgu, sgu, wd, sd, wqkv, sqkv, pos, kc, vc, lengths,
          cos, sin)


def _rmsnorm_quant_np(x, gamma):
  var = np.mean(np.square(x), axis=1, keepdims=True)
  xn = x / np.sqrt(var + EPS) * gamma
  xs = np.maximum(np.abs(xn).max(1, keepdims=True), 1e-9) / 127.0
  xq = np.round(xn / xs).astype(np.int8)
  return xq, xs


def _reference(ms):
  (x, g1, g2, wgu, sgu, wd, sd, wqkv, sqkv, pos, kc, vc, lengths,
   cos, sin) = ms
  # MLP with per-(row, BF-tile) hidden quantization (the megakernel's DRQ
  # granularity, pallas_mlp.py numerics).
  xq, xs = _rmsnorm_quant_np(x, g1)
  acc = np.zeros((B, D), np.float32)
  for t in range(F // BF):
    rows_g = slice(t * BF, (t + 1) * BF)
    rows_u = slice(F + t * BF, F + (t + 1) * BF)
    gate = (xq.astype(np.int32) @ wgu[rows_g].astype(np.int32).T
            ).astype(np.float32) * xs * sgu[rows_g]
    up = (xq.astype(np.int32) @ wgu[rows_u].astype(np.int32).T
          ).astype(np.float32) * xs * sgu[rows_u]
    c = 0.7978845608028654
    ga = 0.5 * gate * (1.0 + np.tanh(c * (gate + 0.044715 * gate ** 3)))
    hid = ga * up
    hs = np.maximum(np.abs(hid).max(1, keepdims=True), 1e-9) / 127.0
    hq = np.round(hid / hs).astype(np.int8)
    acc += (hq.astype(np.int32) @ wd[:, t * BF:(t + 1) * BF].astype(
        np.int32).T).astype(np.float32) * hs
  x_ffn = x + acc * sd
  # QKV + rope + new-row quantization.
  xq2, xs2 = _rmsnorm_quant_np(x_ffn, g2)
  qkv = (xq2.astype(np.int32) @ wqkv.astype(np.int32).T
         ).astype(np.float32) * xs2 * sqkv

  def rope(v):
    half = H // 2
    return np.concatenate([v[:, :half] * cos - v[:, half:] * sin,
                           v[:, half:] * cos + v[:, :half] * sin], 1)

  q = np.stack([rope(qkv[:, n * H:(n + 1) * H]) for n in range(NQ)], 1)
  k_new = np.clip(np.round(rope(qkv[:, NQ * H:(NQ + 1) * H]) / KQS),
                  -127, 127).astype(np.int8)
  v_new = np.clip(np.round(qkv[:, (NQ + 1) * H:] / VQS),
                  -127, 127).astype(np.int8)
  # Attention oracle: the shipped stale-cache kernel in interpret mode.
  ctx = pallas_attention.decode_attention_int8_lengths_stale(
      jnp.asarray(q[:, None]).reshape(B, 1, NQ, H),
      jnp.asarray(kc).reshape(B, 1, S, H),
      jnp.asarray(vc).reshape(B, 1, S, H),
      KS, VS, jnp.asarray(lengths),
      jnp.asarray(k_new).reshape(B, 1, 1, H),
      jnp.asarray(v_new).reshape(B, 1, 1, H),
      batch_block=BB, interpret=True)
  return x_ffn, k_new, v_new, np.asarray(ctx).reshape(B, NQ, H)


def test_fused_block_matches_composition():
  ms = _mk()
  (x, g1, g2, wgu, sgu, wd, sd, wqkv, sqkv, pos, kc, vc, lengths,
   cos, sin) = ms
  want_xffn, want_k, want_v, want_ctx = _reference(ms)
  ctx, x_ffn, k_new, v_new, _, _ = pallas_block.fused_mlp_qkv_attention(
      jnp.asarray(x), jnp.asarray(g1),
      pallas_qmatmul.pack_int4_split(jnp.asarray(wgu)), jnp.asarray(sgu),
      pallas_mlp.pack_int4_split_grouped(jnp.asarray(wd), BF),
      jnp.asarray(sd), jnp.asarray(g2),
      pallas_qmatmul.pack_int4_split(jnp.asarray(wqkv)),
      jnp.asarray(sqkv), jnp.asarray(cos), jnp.asarray(sin),
      jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(lengths),
      jnp.int32(pos),
      KS, VS, KQS, VQS, NQ, act='gelu', eps=EPS, bf=BF, bb=BB, ring=RING,
      writeback=False, interpret=True)
  np.testing.assert_allclose(np.asarray(x_ffn), want_xffn, rtol=2e-5,
                             atol=2e-5)
  np.testing.assert_array_equal(np.asarray(k_new), want_k)
  np.testing.assert_array_equal(np.asarray(v_new), want_v)
  np.testing.assert_allclose(np.asarray(ctx), want_ctx, rtol=2e-4,
                             atol=2e-4)
