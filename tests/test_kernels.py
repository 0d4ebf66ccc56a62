"""Kernel tests: Pallas fused dequant-matmul vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_edge_quantizer_tpu.kernels import pallas_qmatmul, qmatmul


def _quantized_weight(rng, n, k, bits=8):
  w = rng.normal(size=(n, k)).astype(np.float32) * 0.1
  qmax = 2 ** (bits - 1) - 1
  scale = np.abs(w).max(axis=1) / qmax
  w_q = np.clip(np.round(w / scale[:, None]), -qmax - 1, qmax).astype(np.int8)
  return w_q, scale.astype(np.float32)


class TestQmatmulRef:

  def test_channelwise_matches_dense(self):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 128)).astype(np.float32)
    w_q, scale = _quantized_weight(rng, 64, 128)
    y = qmatmul.qmatmul_ref(jnp.asarray(x), jnp.asarray(w_q),
                            jnp.asarray(scale))
    dense = x @ (w_q.astype(np.float32) * scale[:, None]).T
    np.testing.assert_allclose(np.asarray(y), dense, rtol=1e-4, atol=1e-4)

  def test_blockwise_matches_dense(self):
    rng = np.random.default_rng(1)
    n, k, bs = 32, 128, 32
    x = rng.normal(size=(4, k)).astype(np.float32)
    w = rng.normal(size=(n, k)).astype(np.float32) * 0.1
    scale = (np.abs(w.reshape(n, k // bs, bs)).max(axis=-1) / 7).astype(
        np.float32)
    w_q = np.clip(np.round(w.reshape(n, k // bs, bs) / scale[..., None]),
                  -8, 7).astype(np.int8).reshape(n, k)
    y = qmatmul.qmatmul_ref(jnp.asarray(x), jnp.asarray(w_q),
                            jnp.asarray(scale), block_size=bs)
    dense_w = (w_q.reshape(n, k // bs, bs) * scale[..., None]).reshape(n, k)
    np.testing.assert_allclose(np.asarray(y), x @ dense_w.T,
                               rtol=1e-4, atol=1e-4)

  def test_drq_close_to_float(self):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    w_q, scale = _quantized_weight(rng, 128, 256)
    y_drq = qmatmul.drq_matmul_ref(jnp.asarray(x), jnp.asarray(w_q),
                                   jnp.asarray(scale))
    dense = x @ (w_q.astype(np.float32) * scale[:, None]).T
    # DRQ adds activation-quantization noise; still close.
    err = np.mean((np.asarray(y_drq) - dense) ** 2)
    assert err < np.mean(dense ** 2) * 1e-3


class TestPallasKernel:
  """Run via the Pallas interpreter on CPU; on TPU the same code compiles
  to Mosaic."""

  @pytest.mark.parametrize('m,n,k', [(4, 256, 512), (16, 512, 256)])
  def test_channelwise(self, m, n, k):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(m, k)).astype(np.float32)
    w_q, scale = _quantized_weight(rng, n, k)
    y = pallas_qmatmul.qmatmul_pallas(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale),
        interpret=True)
    expected = np.asarray(qmatmul.qmatmul_ref(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale)))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)

  def test_pick_bm_contract(self):
    """Pin the row-tile selection the multi-tile tests below rely on."""
    # Small footprint: whole M resident, single row tile.
    assert pallas_qmatmul._pick_bm(1024, 128 * 4, 8) == 1024
    # f32 K=4096: 1024 rows * 16 KiB = 16 MiB > 6 MiB budget -> bm=256.
    assert pallas_qmatmul._pick_bm(1024, 4096 * 4, 8) == 256
    # DRQ K=4096 (9 B/row-elem): even 256 rows exceed the budget; the
    # sublane fallback keeps it compiling (advice round-2: the old 256
    # floor silently blew Mosaic's 16 MB scoped VMEM at big K).
    assert pallas_qmatmul._pick_bm(1024, 4096 * 9, 32) == 160
    assert pallas_qmatmul._pick_bm(1024, 16384 * 9, 32) == 32

  def test_large_m_row_tiled(self):
    """M spans multiple row tiles (encoder/prefill shapes): the row-tiled
    grid must agree with the XLA twin; the pre-fix whole-M x block OOM'd
    Mosaic's 16 MB scoped VMEM on TPU at M=16384."""
    rng = np.random.default_rng(11)
    m, n, k = 1024, 256, 4096  # bm=256 -> grid dim 0 has 4 row tiles
    assert pallas_qmatmul._pick_bm(m, k * 4, 8) == 256
    x = rng.normal(size=(m, k)).astype(np.float32)
    w_q, scale = _quantized_weight(rng, n, k)
    y = pallas_qmatmul.qmatmul_pallas(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale),
        interpret=True)
    expected = np.asarray(qmatmul.qmatmul_ref(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale)))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)

  def test_large_m_non_multiple_of_tile(self):
    rng = np.random.default_rng(12)
    m, n, k = 700, 256, 4096  # pads to 3 row tiles (bm=256), slices to 700
    x = rng.normal(size=(m, k)).astype(np.float32)
    w_q, scale = _quantized_weight(rng, n, k)
    y = pallas_qmatmul.qmatmul_pallas(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale),
        interpret=True)
    expected = np.asarray(qmatmul.qmatmul_ref(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale)))
    assert y.shape == (m, n)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)

  def test_with_bias_and_3d_input(self):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 256)).astype(np.float32)
    w_q, scale = _quantized_weight(rng, 256, 256)
    bias = rng.normal(size=(256,)).astype(np.float32)
    y = pallas_qmatmul.qmatmul_pallas(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale),
        bias=jnp.asarray(bias), interpret=True)
    expected = np.asarray(qmatmul.qmatmul_ref(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale),
        bias=jnp.asarray(bias)))
    assert y.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)

  def test_blockwise(self):
    rng = np.random.default_rng(5)
    n, k, bs = 256, 256, 64
    x = rng.normal(size=(4, k)).astype(np.float32)
    w = rng.normal(size=(n, k)).astype(np.float32) * 0.1
    scale = (np.abs(w.reshape(n, k // bs, bs)).max(axis=-1) / 7).astype(
        np.float32)
    w_q = np.clip(np.round(w.reshape(n, k // bs, bs) / scale[..., None]),
                  -8, 7).astype(np.int8).reshape(n, k)
    y = pallas_qmatmul.qmatmul_pallas(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale),
        block_size=bs, interpret=True)
    expected = np.asarray(qmatmul.qmatmul_ref(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(scale), block_size=bs))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-3, atol=1e-3)


class TestDecodeAttentionInt8:

  def test_matches_reference(self):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(7)
    b, nk, g, h, s = 2, 1, 4, 64, 128
    q = jnp.asarray(rng.standard_normal((b, nk, g, h)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
    ks, vs = 0.01, 0.02
    lengths = jnp.asarray([100, 37], jnp.int32)
    out = pa.decode_attention_int8(q, kq, vq, ks, vs, lengths,
                                   interpret=True)
    ref = pa.decode_attention_int8_ref(q, kq, vq, ks, vs, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

  def test_masking_respects_length(self):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(8)
    b, nk, g, h, s = 1, 1, 2, 32, 64
    q = jnp.asarray(rng.standard_normal((b, nk, g, h)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
    short = pa.decode_attention_int8(q, kq, vq, 0.01, 0.01,
                                     jnp.asarray([5], jnp.int32),
                                     interpret=True)
    # Tail cache contents must not influence the output.
    kq2 = kq.at[:, :, 10:].set(99)
    vq2 = vq.at[:, :, 10:].set(-99)
    short2 = pa.decode_attention_int8(q, kq2, vq2, 0.01, 0.01,
                                      jnp.asarray([5], jnp.int32),
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(short), np.asarray(short2))


class TestFlashAttentionInt8:
  """Prefill-shaped flash attention (S-blocked online softmax, int8 KV)."""

  def _data(self, b=2, nk=1, r=64, s=128, h=64, seed=0, causal=True):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, nk, r, h)).astype(np.float32)
    kq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    vq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    mask = np.zeros((b, 1, r, s), np.float32)
    if causal:
      g = 2  # pretend grouped rows: row t visible up to t//g + 1
      for t in range(r):
        mask[:, :, t, (t // g) + 1:] = -1e9
    return q, kq, vq, mask

  def _xla_ref(self, q, kq, vq, ks, vs, mask, zp_k=0.0, zp_v=0.0):
    qf = q.astype(np.float64)
    scores = np.einsum('bngh,bnsh->bngs', qf, kq.astype(np.float64))
    scores = scores - zp_k * qf.sum(-1, keepdims=True)
    scores = scores * (ks / np.sqrt(q.shape[-1]))
    scores = scores + mask.astype(np.float64)
    scores -= scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    return (np.einsum('bngs,bnsh->bngh', p,
                      vq.astype(np.float64)) - zp_v) * vs

  @pytest.mark.parametrize('r,s,block_r,block_s', [
      (64, 128, 32, 64),     # multi-tile in both dims
      (64, 128, 256, 512),   # blocks clamp to full extents
      (96, 160, 32, 64),     # non-power-of-two extents (block halving)
  ])
  def test_matches_reference(self, r, s, block_r, block_s):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, mask = self._data(r=r, s=s)
    got = np.asarray(pa.flash_attention_int8_masked(
        q, kq, vq, 0.04, 0.03, mask, block_r=block_r, block_s=block_s,
        interpret=True))
    want = self._xla_ref(q, kq, vq, 0.04, 0.03, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  def test_zero_points(self):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, mask = self._data(seed=3)
    got = np.asarray(pa.flash_attention_int8_masked(
        q, kq, vq, 0.05, 0.02, mask, k_zero_point=3.0, v_zero_point=-2.0,
        block_r=32, block_s=64, interpret=True))
    want = self._xla_ref(q, kq, vq, 0.05, 0.02, mask, zp_k=3.0, zp_v=-2.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  def test_matches_decode_kernel_on_decode_shape(self):
    """Same numerics as the decode kernel when R is small."""
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, mask = self._data(r=8, s=128, causal=False)
    flash = np.asarray(pa.flash_attention_int8_masked(
        q, kq, vq, 0.04, 0.03, mask, interpret=True))
    decode = np.asarray(pa.decode_attention_int8_masked(
        q, kq, vq, 0.04, 0.03, mask, interpret=True))
    np.testing.assert_allclose(flash, decode, rtol=1e-4, atol=1e-4)


class TestInt8DrqKernel:
  """In-kernel activation quantization int8 x int8 DRQ matmul."""

  @pytest.mark.parametrize('m,n,k',
                           [(8, 256, 256), (5, 384, 512), (600, 256, 128)])
  def test_matches_xla_drq(self, m, n, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.integers(-127, 128, (n, k)).astype(np.int8)
    s = (rng.random(n) * 0.01 + 0.001).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(pallas_qmatmul.qmatmul_pallas_int8_drq(
        x, w, jnp.asarray(s), bias=jnp.asarray(b), interpret=True))
    want = np.asarray(qmatmul.drq_matmul_ref(
        x, w, jnp.asarray(s), bias=jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  def test_3d_input_no_bias(self):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 256)).astype(np.float32)
    w = rng.integers(-127, 128, (128, 256)).astype(np.int8)
    s = np.full(128, 0.01, np.float32)
    got = np.asarray(pallas_qmatmul.qmatmul_pallas_int8_drq(
        x, w, jnp.asarray(s), interpret=True))
    want = np.asarray(qmatmul.drq_matmul_ref(x, w, jnp.asarray(s)))
    assert got.shape == (2, 4, 128)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  def test_multi_row_tile_scratch_reuse(self):
    """M spans several row tiles: the per-row-tile re-quantization
    (pl.when(program_id(1) == 0)) must refresh the int8/scale scratch for
    EVERY row tile — scratch reuse across tiles is the riskiest part of
    the M-blocking."""
    rng = np.random.default_rng(5)
    m, n, k = 512, 256, 4096
    assert pallas_qmatmul._pick_bm(m, k * 9, 32) == 160  # 4 row tiles
    # Exactly-representable activations (int grid * power-of-two row
    # scale): in-kernel x * reciprocal(xs) and the ref's x / xs then agree
    # bit-for-bit, so any mismatch is a real scratch-reuse bug, not
    # rounding-tie noise.
    xq0 = rng.integers(-127, 128, (m, k)).astype(np.float32)
    xq0[:, 0] = 127.0  # pin each row's absmax
    x = xq0 * 0.03125
    w = rng.integers(-127, 128, (n, k)).astype(np.int8)
    s = (rng.random(n) * 0.01 + 0.001).astype(np.float32)
    got = np.asarray(pallas_qmatmul.qmatmul_pallas_int8_drq(
        x, w, jnp.asarray(s), interpret=True))
    want = np.asarray(qmatmul.drq_matmul_ref(x, w, jnp.asarray(s)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestInt4PackedDrqKernel:
  """Packed int4 weights x in-kernel int8-quantized activations (MXU int8)."""

  @pytest.mark.parametrize('m,n,k',
                           [(8, 256, 256), (5, 384, 512), (600, 256, 128)])
  def test_matches_integer_twin(self, m, n, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.integers(-8, 8, (n, k)).astype(np.int8)
    s = (rng.random(n) * 0.01 + 0.001).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    packed = pallas_qmatmul.pack_int4_split(jnp.asarray(w))
    got = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
        x, packed, jnp.asarray(s), bias=jnp.asarray(b), interpret=True))
    # Exact twin: identical per-row activation quantization, exact
    # integer contraction, same rescale order.
    absmax = np.max(np.abs(x), axis=1, keepdims=True)
    xs = np.maximum(absmax, 1e-9) / 127.0
    xq = np.round(x / xs).astype(np.int32)
    want = (xq @ w.astype(np.int32).T).astype(np.float32) * xs * s + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

  def test_bf16_input_and_3d(self):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 256)).astype(np.float32)
    w = rng.integers(-8, 8, (128, 256)).astype(np.int8)
    s = np.full(128, 0.01, np.float32)
    packed = pallas_qmatmul.pack_int4_split(jnp.asarray(w))
    got = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
        jnp.asarray(x, jnp.bfloat16), packed, jnp.asarray(s),
        interpret=True).astype(jnp.float32))
    want = np.asarray(qmatmul.drq_matmul_ref(
        x, w, jnp.asarray(s))).astype(np.float32)
    assert got.shape == (2, 4, 128)
    # bf16 inputs round before quantization; compare loosely to the f32
    # DRQ twin.
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)

  def test_multi_row_tile_scratch_reuse(self):
    """Exact-twin check with M spanning several row tiles (the DRQ
    scratch re-quantizes once per row tile; see the int8 twin above)."""
    rng = np.random.default_rng(6)
    m, n, k = 512, 256, 4096
    assert pallas_qmatmul._pick_bm(m, k * 9, 32) == 160  # 4 row tiles
    # Exactly-representable activations (see the int8 twin above).
    xq0 = rng.integers(-127, 128, (m, k)).astype(np.float32)
    xq0[:, 0] = 127.0
    x = xq0 * 0.03125
    w = rng.integers(-8, 8, (n, k)).astype(np.int8)
    s = (rng.random(n) * 0.01 + 0.001).astype(np.float32)
    packed = pallas_qmatmul.pack_int4_split(jnp.asarray(w))
    got = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
        x, packed, jnp.asarray(s), interpret=True))
    want = (xq0.astype(np.int64) @ w.astype(np.int64).T).astype(
        np.float32) * 0.03125 * s
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

  def test_drq_close_to_weight_only(self):
    # DRQ adds activation-quantization noise only: ~0.4% relative on
    # gaussian data (the reference's accepted DRQ error regime).
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    w = rng.integers(-8, 8, (256, 512)).astype(np.int8)
    s = np.full(256, 0.01, np.float32)
    packed = pallas_qmatmul.pack_int4_split(jnp.asarray(w))
    drq = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
        x, packed, jnp.asarray(s), interpret=True))
    wo = np.asarray(pallas_qmatmul.qmatmul_pallas_int4_packed(
        x, packed, jnp.asarray(s), interpret=True))
    err = np.linalg.norm(drq - wo) / np.linalg.norm(wo)
    assert err < 0.02, err


class TestDynlenAttention:
  """Dynamic-length decode attention: manual HBM DMA, live-prefix reads."""

  def test_matches_reference_per_row_lengths(self):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(0)
    b, nk, g, h, s = 3, 1, 8, 128, 512
    q = rng.standard_normal((b, nk, g, h)).astype(np.float32)
    kq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    vq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    lengths = np.array([65, 300, 512], np.int32)
    got = np.asarray(pa.decode_attention_int8_dynlen(
        q, kq, vq, 0.04, 0.03, jnp.asarray(lengths), k_zero_point=2.0,
        v_zero_point=-1.0, chunk=128, interpret=True))
    qf = q.astype(np.float64)
    scores = np.einsum('bngh,bnsh->bngs', qf, kq.astype(np.float64))
    scores -= 2.0 * qf.sum(-1, keepdims=True)
    scores *= 0.04 / np.sqrt(h)
    pos = np.arange(s)[None, None, None, :]
    scores = np.where(pos < lengths[:, None, None, None], scores, -1e30)
    scores -= scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    want = (np.einsum('bngs,bnsh->bngh', p,
                      vq.astype(np.float64)) + 1.0) * 0.03
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  def test_executor_dynlen_matches_masked(self, monkeypatch):
    """AEQT_ATTN_DYNLEN derives lengths from the prefix mask in-graph and
    must reproduce the masked path's outputs (CPU: XLA twin vs XLA twin
    plus the length reduce — a structural smoke test)."""
    import jax as _jax
    monkeypatch.setenv('AEQT_ATTN_DYNLEN', '1')
    from ai_edge_quantizer_tpu.models import gemma
    from ai_edge_quantizer_tpu import Quantizer
    from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=2, prefill_len=8,
                            signatures=('decode',))
    gemma.stamp_int8_kv_cache(g)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    qg = qt.quantize().quantized_model
    inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=5)
    out1 = GraphExecutor(qg).signature_runner('decode')(inputs)
    monkeypatch.setenv('AEQT_ATTN_DYNLEN', '0')
    out2 = GraphExecutor(qg).signature_runner('decode')(inputs)
    np.testing.assert_allclose(np.asarray(out1['logits']),
                               np.asarray(out2['logits']), rtol=1e-4,
                               atol=1e-4)


class TestLengthsAttention:
  """Prefix-lengths decode attention: the mask block never streams."""

  def _case(self, seed=0, b=4, nk=1, g=8, h=128, s=256):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, nk, g, h)).astype(np.float32)
    kq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    vq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    lengths = rng.integers(1, s + 1, b).astype(np.int32)
    pos = np.arange(s)[None, None, None, :]
    mask = np.where(pos < lengths[:, None, None, None],
                    np.float32(0.0), np.float32(-1e9))
    mask = np.broadcast_to(mask, (b, 1, g, s)).astype(np.float32)
    return q, kq, vq, lengths, mask

  @pytest.mark.parametrize('compute', ['f32', 'bf16', 'int8'])
  def test_matches_masked_twin(self, compute):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, lengths, mask = self._case()
    got = np.asarray(pa.decode_attention_int8_lengths(
        q, kq, vq, 0.05, 0.02, jnp.asarray(lengths), k_zero_point=1.5,
        v_zero_point=-0.5, compute=compute, batch_block=4, interpret=True))
    want = np.asarray(pa.decode_attention_int8_masked(
        q, kq, vq, 0.05, 0.02, jnp.asarray(mask), k_zero_point=1.5,
        v_zero_point=-0.5, compute=compute, batch_block=4, interpret=True))
    np.testing.assert_array_equal(got, want)

  def test_bf16_out_dtype_matches_cast(self):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, lengths, _ = self._case(seed=3)
    f32 = pa.decode_attention_int8_lengths(
        q, kq, vq, 0.05, 0.02, jnp.asarray(lengths), interpret=True)
    bf16 = pa.decode_attention_int8_lengths(
        q, kq, vq, 0.05, 0.02, jnp.asarray(lengths),
        out_dtype=jnp.bfloat16, interpret=True)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32.astype(jnp.bfloat16).astype(jnp.float32)),
        np.asarray(bf16.astype(jnp.float32)))

  def test_grouped_kv_heads(self):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, lengths, mask = self._case(seed=5, b=2, nk=2, g=4)
    got = np.asarray(pa.decode_attention_int8_lengths(
        q, kq, vq, 0.04, 0.03, jnp.asarray(lengths), batch_block=2,
        interpret=True))
    want = np.asarray(pa.decode_attention_int8_masked(
        q, kq, vq, 0.04, 0.03, jnp.asarray(mask), batch_block=2,
        interpret=True))
    np.testing.assert_array_equal(got, want)

  def test_executor_lengths_matches_default(self, monkeypatch):
    """AEQT_ATTN_LENGTHS derives lengths from the prefix mask; outputs
    must match the default path (CPU: XLA twin both ways — structural)."""
    monkeypatch.setenv('AEQT_ATTN_LENGTHS', '1')
    from ai_edge_quantizer_tpu.models import gemma
    from ai_edge_quantizer_tpu import Quantizer
    from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=2, prefill_len=8,
                            signatures=('decode',))
    gemma.stamp_int8_kv_cache(g)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    qg = qt.quantize().quantized_model
    inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=5)
    out1 = GraphExecutor(qg).signature_runner('decode')(inputs)
    monkeypatch.setenv('AEQT_ATTN_LENGTHS', '0')
    out2 = GraphExecutor(qg).signature_runner('decode')(inputs)
    np.testing.assert_allclose(np.asarray(out1['logits']),
                               np.asarray(out2['logits']), rtol=1e-4,
                               atol=1e-4)


class TestWritebackAttention:
  """Lengths attention with the KV row write folded into the dispatch."""

  def _case(self, seed=0, b=4, nk=1, g=8, h=128, s=256, pos=100):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, nk, g, h)).astype(np.float32)
    kq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    vq = rng.integers(-127, 128, (b, nk, s, h)).astype(np.int8)
    kn = rng.integers(-127, 128, (b, nk, 1, h)).astype(np.int8)
    vn = rng.integers(-127, 128, (b, nk, 1, h)).astype(np.int8)
    lengths = np.full(b, pos + 1, np.int32)  # visible incl. the new row
    return q, kq, vq, kn, vn, lengths

  @pytest.mark.parametrize('pos', [0, 31, 32, 100, 255])
  @pytest.mark.parametrize('compute', ['f32', 'int8'])
  def test_matches_dus_plus_lengths(self, pos, compute):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, kn, vn, lengths = self._case(pos=pos)
    ctx, k_out, v_out = pa.decode_attention_int8_lengths_writeback(
        q, kq, vq, 0.05, 0.02, jnp.asarray(lengths), kn, vn,
        jnp.int32(pos), k_zero_point=1.5, v_zero_point=-0.5,
        compute=compute, batch_block=4, interpret=True)
    starts = (0, 0, pos, 0)
    k_ref = jax.lax.dynamic_update_slice(jnp.asarray(kq), jnp.asarray(kn),
                                         starts)
    v_ref = jax.lax.dynamic_update_slice(jnp.asarray(vq), jnp.asarray(vn),
                                         starts)
    np.testing.assert_array_equal(np.asarray(k_out), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_out), np.asarray(v_ref))
    want = np.asarray(pa.decode_attention_int8_lengths(
        q, k_ref, v_ref, 0.05, 0.02, jnp.asarray(lengths),
        k_zero_point=1.5, v_zero_point=-0.5, compute=compute,
        batch_block=4, interpret=True))
    np.testing.assert_array_equal(np.asarray(ctx), want)

  def test_grouped_kv_heads(self):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, kn, vn, lengths = self._case(b=2, nk=2, g=4, pos=64)
    ctx, k_out, v_out = pa.decode_attention_int8_lengths_writeback(
        q, kq, vq, 0.04, 0.03, jnp.asarray(lengths), kn, vn,
        jnp.int32(64), batch_block=2, interpret=True)
    starts = (0, 0, 64, 0)
    k_ref = jax.lax.dynamic_update_slice(jnp.asarray(kq), jnp.asarray(kn),
                                         starts)
    v_ref = jax.lax.dynamic_update_slice(jnp.asarray(vq), jnp.asarray(vn),
                                         starts)
    np.testing.assert_array_equal(np.asarray(k_out), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_out), np.asarray(v_ref))
    want = np.asarray(pa.decode_attention_int8_lengths(
        q, k_ref, v_ref, 0.04, 0.03, jnp.asarray(lengths),
        batch_block=2, interpret=True))
    np.testing.assert_array_equal(np.asarray(ctx), want)

  def test_executor_writeback_matches_unfused(self, monkeypatch):
    """AEQT_ATTN_WRITEBACK folds the cache DUS into the fused attention;
    outputs (logits AND updated caches) must match the unfused path.
    On CPU this exercises the matcher + skip wiring + XLA fallback."""
    monkeypatch.setenv('AEQT_ATTN_LENGTHS', '1')
    from ai_edge_quantizer_tpu.models import gemma
    from ai_edge_quantizer_tpu import Quantizer
    from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=2, prefill_len=8,
                            signatures=('decode',))
    gemma.stamp_int8_kv_cache(g)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    qg = qt.quantize().quantized_model
    inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=5)
    monkeypatch.setenv('AEQT_ATTN_WRITEBACK', '1')
    ex1 = GraphExecutor(qg)
    assert any('writeback' in f for f in ex1._attn_fusions.values()), \
        'writeback not matched on the toy decode graph'
    out1 = ex1.signature_runner('decode')(inputs)
    monkeypatch.setenv('AEQT_ATTN_WRITEBACK', '0')
    out2 = GraphExecutor(qg).signature_runner('decode')(inputs)
    assert out1.keys() == out2.keys()
    for name in out2:
      a, b = np.asarray(out1[name]), np.asarray(out2[name])
      if a.dtype == np.int8:
        np.testing.assert_array_equal(a, b, err_msg=name)
      else:
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=name)

  def test_executor_writeback_capture_all_unrolls(self, monkeypatch):
    """capture_all must evaluate the skipped DUS ops normally."""
    monkeypatch.setenv('AEQT_ATTN_LENGTHS', '1')
    monkeypatch.setenv('AEQT_ATTN_WRITEBACK', '1')
    from ai_edge_quantizer_tpu.models import gemma
    from ai_edge_quantizer_tpu import Quantizer
    from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=2, prefill_len=8,
                            signatures=('decode',))
    gemma.stamp_int8_kv_cache(g)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    qg = qt.quantize().quantized_model
    inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=5)
    ex = GraphExecutor(qg)
    cap = ex.signature_runner('decode', capture_all=True)(inputs)
    run = ex.signature_runner('decode')(inputs)
    sig = qg.signature_by_key('decode')
    sgt = qg.subgraphs[sig.subgraph_index].tensors
    name_of = {tid: sgt[tid].name for tid in sig.outputs.values()}
    for out_name, tid in sig.outputs.items():
      a = np.asarray(cap[name_of[tid]])
      b = np.asarray(run[out_name])
      if a.dtype == np.int8:
        np.testing.assert_array_equal(a, b, err_msg=out_name)
      else:
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=out_name)

  @pytest.mark.parametrize('pos', [0, 31, 100, 255])
  @pytest.mark.parametrize('compute', ['f32', 'bf16', 'int8'])
  def test_stale_mode_matches_dus_plus_lengths(self, pos, compute):
    """Stale-cache + inline current column == DUS + lengths attention
    (same softmax membership; fp reassociation only)."""
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kq, vq, kn, vn, lengths = self._case(pos=pos)
    got = np.asarray(pa.decode_attention_int8_lengths_stale(
        q, kq, vq, 0.05, 0.02, jnp.asarray(lengths), kn, vn,
        k_zero_point=1.5, v_zero_point=-0.5, compute=compute,
        batch_block=4, interpret=True))
    starts = (0, 0, pos, 0)
    k_ref = jax.lax.dynamic_update_slice(jnp.asarray(kq), jnp.asarray(kn),
                                         starts)
    v_ref = jax.lax.dynamic_update_slice(jnp.asarray(vq), jnp.asarray(vn),
                                         starts)
    want = np.asarray(pa.decode_attention_int8_lengths(
        q, k_ref, v_ref, 0.05, 0.02, jnp.asarray(lengths),
        k_zero_point=1.5, v_zero_point=-0.5, compute=compute,
        batch_block=4, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

  def test_executor_stale_mode_matches_unfused(self, monkeypatch):
    """Executor stale-mode wiring (CPU: falls back to XLA DUS path, but
    the matcher + skip + carry-write structure is exercised)."""
    monkeypatch.setenv('AEQT_ATTN_LENGTHS', '1')
    monkeypatch.setenv('AEQT_ATTN_WRITEBACK', '1')
    monkeypatch.setenv('AEQT_ATTN_WRITEBACK_MODE', 'stale')
    from ai_edge_quantizer_tpu.models import gemma
    from ai_edge_quantizer_tpu import Quantizer
    from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=2, prefill_len=8,
                            signatures=('decode',))
    gemma.stamp_int8_kv_cache(g)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    qg = qt.quantize().quantized_model
    inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=5)
    out1 = GraphExecutor(qg).signature_runner('decode')(inputs)
    monkeypatch.setenv('AEQT_ATTN_WRITEBACK', '0')
    out2 = GraphExecutor(qg).signature_runner('decode')(inputs)
    for name in out2:
      a, b = np.asarray(out1[name]), np.asarray(out2[name])
      if a.dtype == np.int8:
        np.testing.assert_array_equal(a, b, err_msg=name)
      else:
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=name)


class TestInt4KvAttention:
  """int4-packed KV cache with per-token scales (opt-in serving
  primitive: ~11-16% attention error on gaussian data vs float — the
  serving DEFAULT stays int8 KV; this kernel is for quality-tolerant
  deployments wanting the extra 2x cache-bandwidth cut)."""

  def _data(self, b=3, nk=1, g=8, h=128, s=256, seed=0):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(seed)
    kf = rng.standard_normal((b, nk, s, h)).astype(np.float32)
    vf = rng.standard_normal((b, nk, s, h)).astype(np.float32)
    kp, ks = pa.quantize_kv_rows_int4(jnp.asarray(kf))
    vp, vs = pa.quantize_kv_rows_int4(jnp.asarray(vf))
    sc = jnp.zeros((b, nk, 8, s), jnp.bfloat16)
    sc = sc.at[:, :, 0, :].set(ks.astype(jnp.bfloat16))
    sc = sc.at[:, :, 1, :].set(vs.astype(jnp.bfloat16))
    q = jnp.asarray(rng.standard_normal((b, nk, g, h)), jnp.float32)
    lengths = jnp.asarray([s - 6, 100, 37][:b], jnp.int32)
    return q, kp, vp, sc, lengths

  def test_pack_roundtrip(self):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(1)
    x = rng.integers(-8, 8, (2, 5, 64)).astype(np.int8)
    packed = pa.pack_int4_rows(jnp.asarray(x))
    assert packed.shape == (2, 5, 32)
    np.testing.assert_array_equal(
        np.asarray(pa.unpack_int4_rows(packed)), x)

  def test_kernel_matches_xla_twin(self):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kp, vp, sc, lengths = self._data()
    got = np.asarray(pa.decode_attention_int4_lengths(
        q, kp, vp, sc, lengths, interpret=True))
    want = np.asarray(pa.decode_attention_int4_ref(q, kp, vp, sc, lengths))
    # bf16 kernel dots vs the twin's f32: sub-percent agreement.
    err = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9))
    assert err < 1e-2, err

  def test_length_masking(self):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, kp, vp, sc, _ = self._data(b=1)
    lengths = jnp.asarray([5], jnp.int32)
    out1 = np.asarray(pa.decode_attention_int4_lengths(
        q, kp, vp, sc, lengths, interpret=True))
    # Poisoning the tail (positions >= 5) must not change the output.
    kp2 = kp.at[:, :, 10:].set(255)
    sc2 = sc.at[:, :, 0, 10:].set(99.0)
    out2 = np.asarray(pa.decode_attention_int4_lengths(
        q, kp2, vp, sc2, lengths, interpret=True))
    np.testing.assert_allclose(out1, out2)

  def test_quantize_rows_roundtrip_error(self):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 1, 16, 64)).astype(np.float32)
    packed, scale = pa.quantize_kv_rows_int4(jnp.asarray(x))
    deq = np.asarray(pa.unpack_int4_rows(packed)).astype(
        np.float32) * np.asarray(scale)[..., None]
    rel = np.linalg.norm(deq - x) / np.linalg.norm(x)
    assert rel < 0.12, rel  # int4 grid noise ~ scale/sqrt(12)


class TestInt4GroupAttention:
  """Per-group asym-K / sym-V int4 decode attention (VERDICT r3 item 8)."""

  def _make(self, b=2, nk=2, g=4, h=64, s=128, group=16, seed=0):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, nk, g, h)), jnp.float32)
    # Non-zero-centered K (the RoPE-like regime asym K exists for).
    k = jnp.asarray(rng.standard_normal((b, nk, s, h)) * 0.5 + 0.8,
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nk, s, h)), jnp.float32)
    kp, ks, km = pa.quantize_k_rows_int4_asym(k, group)
    vp, vs = pa.quantize_v_rows_int4_group(v, group)
    sidecar = pa.build_kv_sidecar_group(ks, km, vs)
    lengths = jnp.asarray(rng.integers(8, s + 1, (b,)), jnp.int32)
    return q, k, v, kp, vp, sidecar, lengths

  def test_kernel_matches_ref(self):
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    q, _, _, kp, vp, sidecar, lengths = self._make()
    out = pa.decode_attention_int4_group_lengths(
        q, kp, vp, sidecar, lengths, group=16, interpret=True)
    ref = pa.decode_attention_int4_group_ref(
        q, kp, vp, sidecar, lengths, group=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

  def test_group_beats_per_row_on_outlier_rows(self):
    """A single outlier dim per row crushes the per-row grid; per-group
    scales contain the damage (the KV_QUALITY_r03 failure mode)."""
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    rng = np.random.default_rng(1)
    b, nk, g, h, s, group = 1, 1, 4, 64, 64, 16
    q = jnp.asarray(rng.standard_normal((b, nk, g, h)), jnp.float32)
    k = rng.standard_normal((b, nk, s, h)).astype(np.float32)
    v = rng.standard_normal((b, nk, s, h)).astype(np.float32)
    k[..., 0] *= 12.0  # outlier dimension
    v[..., 0] *= 12.0
    k, v = jnp.asarray(k), jnp.asarray(v)
    lengths = jnp.full((b,), s, jnp.int32)

    # Float reference attention.
    scores = jnp.einsum('bngh,bnsh->bngs', q, k) / (h ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum('bngs,bnsh->bngh', probs, v)

    # Per-row int4.
    kp_r, ks_r = pa.quantize_kv_rows_int4(k)
    vp_r, vs_r = pa.quantize_kv_rows_int4(v)
    scales = jnp.zeros((b, nk, 8, s), jnp.bfloat16)
    scales = scales.at[:, :, 0, :].set(ks_r.astype(jnp.bfloat16))
    scales = scales.at[:, :, 1, :].set(vs_r.astype(jnp.bfloat16))
    out_row = pa.decode_attention_int4_ref(q, kp_r, vp_r, scales, lengths)

    # Per-group asym-K int4.
    kp, ks, km = pa.quantize_k_rows_int4_asym(k, group)
    vp, vs = pa.quantize_v_rows_int4_group(v, group)
    sidecar = pa.build_kv_sidecar_group(ks, km, vs)
    out_grp = pa.decode_attention_int4_group_ref(
        q, kp, vp, sidecar, lengths, group=group)

    err_row = float(jnp.mean((out_row - ref) ** 2))
    err_grp = float(jnp.mean((out_grp - ref) ** 2))
    assert err_grp < 0.7 * err_row, (err_grp, err_row)

  def test_quantizer_roundtrip_bounds(self):
    """Asym per-group dequant error is bounded by scale/2 per element."""
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 8, 64)) * 3 + 1.5, jnp.float32)
    kp, scale, mn = pa.quantize_k_rows_int4_asym(x, 16)
    k32 = kp.astype(jnp.int32)
    codes = jnp.concatenate([(k32 & 0xF), (k32 >> 4)], axis=-1).astype(
        jnp.float32)
    ng = 64 // 16
    deq = (codes.reshape(4, 8, ng, 16) * scale[..., None]
           + mn[..., None]).reshape(4, 8, 64)
    err = np.abs(np.asarray(deq - x))
    bound = np.repeat(np.asarray(scale), 16, axis=-1) * 0.5 + 1e-6
    assert (err <= bound).all()


class TestDrqKblock:
  """K-blocked DRQ packed-int4 matmul (serves K > 8192 on the int8 MXU)."""

  @pytest.mark.parametrize('m,n,k', [(64, 256, 1024), (33, 512, 4096),
                                     (128, 256, 16384)])
  def test_matches_drq_numerics(self, m, n, k):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.kernels import pallas_qmatmul as pq
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.float32)
    w_q = rng.integers(-7, 8, (n, k)).astype(np.int8)
    scale = (rng.random(n) * 0.05 + 0.01).astype(np.float32)
    wp = pq.pack_int4_split(jnp.asarray(w_q))
    bias = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = pq.qmatmul_pallas_int4_packed_drq_kblock(
        x, wp, jnp.asarray(scale), bias=bias, bk=2048, interpret=True)
    absmax = np.max(np.abs(np.asarray(x)), axis=1, keepdims=True)
    xs = np.maximum(absmax, 1e-9) / 127.0
    xq = np.round(np.asarray(x) / xs).astype(np.int8)
    ref = ((xq.astype(np.int32) @ w_q.T.astype(np.int32)).astype(np.float32)
           * xs * scale[None, :] + np.asarray(bias)[None, :])
    np.testing.assert_allclose(np.asarray(y), ref,
                               rtol=1e-5, atol=1e-2)
