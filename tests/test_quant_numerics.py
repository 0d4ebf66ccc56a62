"""Unit tests for the core quantization numerics."""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.algorithms.uniform import quant_numerics as qn

Gran = qtyping.QuantGranularity


class TestRanges:

  def test_signed_ranges(self):
    assert qn.quantized_range(8) == (-128.0, 127.0)
    assert qn.quantized_range(4) == (-8.0, 7.0)
    assert qn.quantized_range(16) == (-32768.0, 32767.0)
    assert qn.quantized_range(2) == (-2.0, 1.0)

  def test_narrow_range_rule(self):
    # Narrow range only for symmetric >= 8 bits.
    assert qn.use_narrow_range(True, 8)
    assert qn.use_narrow_range(True, 16)
    assert not qn.use_narrow_range(True, 4)
    assert not qn.use_narrow_range(False, 8)


class TestZpScale:

  def test_symmetric_tensorwise(self):
    zp, scale = qn.compute_zp_scale(
        np.array(-1.0), np.array(2.0), 8, True, Gran.TENSORWISE)
    assert zp == 0
    np.testing.assert_allclose(scale, 2.0 / 127.0, rtol=1e-6)

  def test_asymmetric_includes_zero(self):
    # min=2, max=4: range must stretch to include 0.
    zp, scale = qn.compute_zp_scale(
        np.array(2.0), np.array(4.0), 8, False, Gran.TENSORWISE)
    np.testing.assert_allclose(scale, 4.0 / 255.0, rtol=1e-6)
    assert zp == -128  # zero maps to qmin since min bound is 0.

  def test_asymmetric_zero_point_roundtrip(self):
    zp, scale = qn.compute_zp_scale(
        np.array(-0.5), np.array(1.5), 8, False, Gran.TENSORWISE)
    # Real zero must be exactly representable.
    zero_q = zp + np.rint(0.0 / scale)
    assert -128 <= zero_q <= 127

  def test_channelwise_shapes(self):
    mins = np.array([-1.0, -2.0, -0.1])
    maxs = np.array([1.0, 0.5, 3.0])
    zp, scale = qn.compute_zp_scale(mins, maxs, 8, True, Gran.CHANNELWISE)
    assert scale.shape == (3,)
    np.testing.assert_allclose(
        scale, np.array([1.0, 2.0, 3.0]) / 127.0, rtol=1e-6)

  def test_zero_range_guard(self):
    zp, scale = qn.compute_zp_scale(
        np.array(0.0), np.array(0.0), 8, True, Gran.TENSORWISE)
    assert scale > 0

  def test_blockwise_scale_is_fp16_grid(self):
    mins = np.array([[-1.234567]])
    maxs = np.array([[1.234567]])
    _, scale = qn.compute_zp_scale(mins, maxs, 4, True, Gran.BLOCKWISE_32)
    # Must survive an fp16 round-trip exactly.
    np.testing.assert_array_equal(
        scale, scale.astype(np.float16).astype(np.float32))


class TestQuantDequant:

  def test_roundtrip_int8_symmetric(self):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(64, 32)).astype(np.float32)
    params = qn.quantize_tensor_min_max(
        data, qtyping.OpName.FULLY_CONNECTED,
        qtyping.TensorQuantizationConfig(num_bits=8, symmetric=True,
                                         granularity=Gran.CHANNELWISE))
    assert params.quantized_data.dtype == np.int8
    assert params.scale.shape == (64,)
    deq = qn.dequantize_array(params.quantized_data, params)
    mse = float(np.mean((deq - data) ** 2))
    assert mse < 1e-4

  def test_narrow_range_applied_int8(self):
    data = np.array([[-10.0, 10.0]], dtype=np.float32)
    params = qn.quantize_tensor_min_max(
        data, qtyping.OpName.FULLY_CONNECTED,
        qtyping.TensorQuantizationConfig(num_bits=8, symmetric=True))
    assert params.quantized_data.min() >= -127

  def test_int4_no_narrow_range(self):
    # Sub-byte symmetric quantization clips to the FULL range [-8, 7]
    # (narrow range would clip to -7). Use an explicit scale so a value
    # actually lands on -8.
    params = qtyping.UniformQuantParams(
        num_bits=4, quantized_dimension=None,
        scale=np.array(1.0, np.float32), zero_point=np.array(0, np.int8),
        symmetric=True)
    q = qn.quantize_array(np.array([-9.0, -8.0, 7.0, 9.0], np.float32),
                          params)
    np.testing.assert_array_equal(q, [-8, -8, 7, 7])
    # int8 symmetric IS narrow range: clips at -127.
    params8 = qtyping.UniformQuantParams(
        num_bits=8, quantized_dimension=None,
        scale=np.array(1.0, np.float32), zero_point=np.array(0, np.int8),
        symmetric=True)
    q8 = qn.quantize_array(np.array([-128.0, -200.0], np.float32), params8)
    np.testing.assert_array_equal(q8, [-127, -127])

  def test_roundtrip_int4_blockwise(self):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(8, 64)).astype(np.float32)
    cfg = qtyping.TensorQuantizationConfig(
        num_bits=4, symmetric=True, granularity=Gran.BLOCKWISE_32)
    params = qn.quantize_tensor_min_max(
        data, qtyping.OpName.FULLY_CONNECTED, cfg)
    assert params.scale.shape == (8, 2)  # [out, n_blocks]
    assert params.block_size == 32
    deq = qn.dequantize_array(params.quantized_data, params)
    mse = float(np.mean((deq - data) ** 2))
    assert mse < 1e-2

  def test_asymmetric_roundtrip(self):
    rng = np.random.default_rng(2)
    data = (rng.random(size=(4, 16)) * 5 + 1).astype(np.float32)
    cfg = qtyping.TensorQuantizationConfig(num_bits=8, symmetric=False)
    params = qn.quantize_tensor_min_max(
        data, qtyping.OpName.FULLY_CONNECTED, cfg)
    deq = qn.dequantize_array(params.quantized_data, params)
    assert float(np.mean((deq - data) ** 2)) < 1e-3


class TestBias:

  def test_bias_scale_is_product(self):
    in_p = qtyping.UniformQuantParams(
        num_bits=8, quantized_dimension=None,
        scale=np.array([0.1], np.float32),
        zero_point=np.array([0]), symmetric=True)
    w_p = qtyping.UniformQuantParams(
        num_bits=8, quantized_dimension=0,
        scale=np.array([0.2, 0.4], np.float32),
        zero_point=np.array([0, 0]), symmetric=True)
    bias = np.array([1.0, -2.0], np.float32)
    out = qn.quantize_bias(bias, in_p, w_p)
    np.testing.assert_allclose(out.scale, [0.02, 0.04], rtol=1e-6)
    assert out.num_bits == 32
    assert out.quantized_data.dtype == np.int32
    np.testing.assert_allclose(
        out.quantized_data, np.rint(bias / out.scale))

  def test_bias_int64_for_int16_act(self):
    in_p = qtyping.UniformQuantParams(
        num_bits=16, quantized_dimension=None,
        scale=np.array([0.001], np.float32),
        zero_point=np.array([0]), symmetric=True)
    w_p = qtyping.UniformQuantParams(
        num_bits=8, quantized_dimension=None,
        scale=np.array([0.01], np.float32),
        zero_point=np.array([0]), symmetric=True)
    out = qn.quantize_bias(np.array([0.5], np.float32), in_p, w_p)
    assert out.num_bits == 64
    assert out.quantized_data.dtype == np.int64


class TestSubbytePacking:

  @pytest.mark.parametrize('num_bits', [2, 4])
  def test_pack_unpack_roundtrip(self, num_bits):
    rng = np.random.default_rng(3)
    lo, hi = qn.quantized_range(num_bits)
    vals = rng.integers(int(lo), int(hi) + 1, size=777).astype(np.int8)
    packed = qn.pack_subbyte(vals, num_bits)
    assert packed.dtype == np.uint8
    assert packed.size == -(-777 * num_bits // 8)
    unpacked = qn.unpack_subbyte(packed, num_bits, 777)
    np.testing.assert_array_equal(unpacked, vals)
