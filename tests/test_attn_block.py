"""AEQT_ATTN_BLOCK serving fusions match the unfused executor path.

Two fusions (opt-in via AEQT_ATTN_BLOCK=1, serving fast path):
  * norm+QKV+rope prologue (kernels/pallas_qkv.qkv_rope_pallas) — the
    RMS_NORM -> FC(qkv) -> SLICE x3 -> RESHAPE/ROPE/TRANSPOSE decode
    chain runs as one pallas_call;
  * attention out-proj+residual epilogue
    (kernels/pallas_attention.decode_attention_oproj_pallas) — the
    ctx -> RESHAPE/TRANSPOSE/RESHAPE -> FC -> ADD tail folds into the
    prefix-length attention kernel (MQA only).

Reference contract: the fused serving config must reproduce the plain
quantized executor's numerics (the reference validates quantized vs
float with per-tensor bounds, model_validator.py:267; here fused-vs-
unfused is held to much tighter equality since both are the SAME
quantized model).
"""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.models import gemma

# MQA toy sized so every FC lands in the packed layout without N-padding
# (N % 256 == 0): qkv (512, 256), o (256, 384), gate_up (512, 256),
# down (256, 256), logits (512, 256).
MQA_TOY = gemma.DecoderConfig(
    vocab_size=512, embed_dim=256, num_layers=2, num_query_heads=6,
    num_kv_heads=1, head_dim=64, ffn_dim=256, max_seq_len=64)


def _quantized_decode(cfg, batch=2):
  g = gemma.build_decoder(cfg, batch=batch, prefill_len=8,
                          signatures=('decode',), fused_projections=True)
  gemma.stamp_int8_kv_cache(g)
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
  return qt.quantize().quantized_model


def _decode_inputs(cfg, batch=2, start_pos=5, seed=0):
  rng = np.random.default_rng(seed)
  inp = gemma.make_inputs(cfg, 'decode', batch, 1, start_pos=start_pos)
  for li in range(cfg.num_layers):
    for kind in ('k', 'v'):
      key = f'layer_{li}_{kind}_cache_in'
      inp[key] = rng.integers(
          -100, 100, size=inp[key].shape).astype(np.int8)
  return inp


def _run(graph, inp):
  ex = GraphExecutor(graph)
  ex.prepare_serving_weights(min_weight_params=0)
  out = {k: np.asarray(v) for k, v in ex.signature_runner('decode')(
      inp).items()}
  return ex, out


class TestQkvPrologueFusion:

  def test_gqa_decode_matches_unfused(self, monkeypatch):
    cfg = gemma.TOY_DECODER  # GQA (NK=2): prologue fuses, epilogue can't
    # TOY qkv weight N = (4+2*2)*32 = 256: packed without padding.
    graph = _quantized_decode(cfg)
    inp = _decode_inputs(cfg)
    monkeypatch.setenv('AEQT_ATTN_BLOCK', '0')
    _, ref = _run(graph, inp)
    monkeypatch.setenv('AEQT_ATTN_BLOCK', '1')
    ex, fused = _run(graph, inp)
    assert len(ex._qkv_fusions) == cfg.num_layers
    assert not any('epilogue' in f for f in ex._attn_fusions.values())
    assert ex._qkv_skip
    assert set(ref) == set(fused)
    for name in ref:
      np.testing.assert_allclose(
          fused[name].astype(np.float32), ref[name].astype(np.float32),
          rtol=1e-3, atol=1e-3, err_msg=name)

  @pytest.mark.parametrize('drq', ['0', '1'])
  def test_mqa_full_attn_block_matches_unfused(self, monkeypatch, drq):
    cfg = MQA_TOY
    graph = _quantized_decode(cfg)
    inp = _decode_inputs(cfg)
    monkeypatch.setenv('AEQT_INT4_DRQ', drq)
    monkeypatch.setenv('AEQT_ATTN_BLOCK', '0')
    _, ref = _run(graph, inp)
    monkeypatch.setenv('AEQT_ATTN_BLOCK', '1')
    ex, fused = _run(graph, inp)
    assert len(ex._qkv_fusions) == cfg.num_layers
    assert all('epilogue' in f for f in ex._attn_fusions.values())
    for name in ref:
      np.testing.assert_allclose(
          fused[name].astype(np.float32), ref[name].astype(np.float32),
          rtol=1e-3, atol=1e-3, err_msg=name)

  def test_no_fusion_without_env(self):
    graph = _quantized_decode(MQA_TOY)
    ex = GraphExecutor(graph)
    ex.prepare_serving_weights(min_weight_params=0)
    assert not ex._qkv_fusions
    assert not any('epilogue' in f for f in ex._attn_fusions.values())


class TestKernelEquivalence:
  """Kernel-level twins: fused pallas calls vs their unfused stages."""

  def test_qkv_rope_kernel_vs_stages(self):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_qkv, pallas_qmatmul

    rng = np.random.default_rng(7)
    b_sz, d, nq, nk, h = 4, 256, 6, 1, 64
    qkv_n = (nq + 2 * nk) * h
    x = rng.standard_normal((b_sz, d)).astype(np.float32)
    gamma = (1.0 + rng.standard_normal(d) * 0.1).astype(np.float32)
    w_int = rng.integers(-8, 8, size=(qkv_n, d)).astype(np.int8)
    scale = (np.abs(rng.standard_normal(qkv_n)) * 0.01 + 1e-3).astype(
        np.float32)
    positions = rng.integers(0, 60, size=(b_sz, 1)).astype(np.int32)
    packed = pallas_qmatmul.pack_int4_split(jnp.asarray(w_int))

    cos, sin = pallas_qkv.rope_cos_sin(jnp.asarray(positions), h, 10000.0)
    q, k, v = pallas_qkv.qkv_rope_pallas(
        jnp.asarray(x).reshape(b_sz, 1, d), jnp.asarray(gamma), packed,
        jnp.asarray(scale), cos, sin, nq=nq, nk=nk, h=h, eps=1e-6,
        drq=True, interpret=True)

    # Unfused stages: rms_norm -> packed DRQ matmul -> split -> rope.
    xn = x * (1.0 / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + 1e-6))
    xn = (xn * gamma).astype(np.float32)
    qkv = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
        jnp.asarray(xn), packed, jnp.asarray(scale), interpret=True))

    def rope(seg):
      half = h // 2
      freqs = 10000.0 ** (-np.arange(0, half, dtype=np.float32) / half)
      ang = positions[..., None].astype(np.float32) * freqs  # [b, 1, half]
      c, s = np.cos(ang), np.sin(ang)
      segs = seg.reshape(b_sz, -1, h)
      x1, x2 = segs[..., :half], segs[..., half:]
      return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)

    q_ref = rope(qkv[:, :nq * h]).reshape(b_sz, 1, nq * h)
    k_ref = rope(qkv[:, nq * h:(nq + nk) * h]).reshape(b_sz, 1, nk * h)
    v_ref = qkv[:, (nq + nk) * h:].reshape(b_sz, 1, nk * h)
    np.testing.assert_allclose(np.asarray(q), q_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k), k_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v), v_ref, rtol=2e-5, atol=2e-5)

  @pytest.mark.parametrize('drq', [False, True])
  def test_oproj_epilogue_vs_stages(self, drq):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention
    from ai_edge_quantizer_tpu.kernels import pallas_qmatmul

    rng = np.random.default_rng(3)
    b_sz, g, h, s, d = 4, 6, 64, 64, 256
    q = rng.standard_normal((b_sz, 1, g, h)).astype(np.float32)
    k_q = rng.integers(-90, 90, size=(b_sz, 1, s, h)).astype(np.int8)
    v_q = rng.integers(-90, 90, size=(b_sz, 1, s, h)).astype(np.int8)
    lengths = rng.integers(4, s, size=(b_sz,)).astype(np.int32)
    x_res = rng.standard_normal((b_sz, d)).astype(np.float32)
    wo_int = rng.integers(-8, 8, size=(d, g * h)).astype(np.int8)
    so = (np.abs(rng.standard_normal(d)) * 0.01 + 1e-3).astype(np.float32)
    wo_packed = pallas_qmatmul.pack_int4_split(jnp.asarray(wo_int))
    k_scale, v_scale, zp_k, zp_v = 0.05, 0.04, 1.0, -2.0

    fused = np.asarray(pallas_attention.decode_attention_oproj_pallas(
        jnp.asarray(q), jnp.asarray(k_q), jnp.asarray(v_q), k_scale,
        v_scale, jnp.asarray(lengths), jnp.asarray(x_res), wo_packed,
        jnp.asarray(so), k_zero_point=zp_k, v_zero_point=zp_v,
        drq=drq, interpret=True))

    ctx = np.asarray(pallas_attention.decode_attention_int8_lengths(
        jnp.asarray(q), jnp.asarray(k_q), jnp.asarray(v_q), k_scale,
        v_scale, jnp.asarray(lengths), k_zero_point=zp_k,
        v_zero_point=zp_v, interpret=True))
    ctx2 = ctx.reshape(b_sz, g * h)
    if drq:
      proj = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
          jnp.asarray(ctx2), wo_packed, jnp.asarray(so), interpret=True))
    else:
      proj = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed(
          jnp.asarray(ctx2), wo_packed, jnp.asarray(so), interpret=True))
    ref = x_res + proj
    np.testing.assert_allclose(fused, ref, rtol=2e-5, atol=2e-5)
