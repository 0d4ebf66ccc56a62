"""Encoder model family (BERT/ViT-class) through the full pipeline.

Covers the third model family: dynamic int8/int4, weight-only fp16, and
calibrated SRQ a8w8 on a bidirectional pre-norm transformer encoder
(models/encoder.py). Mirrors the reference's model-level integration tier
(reference tests/mnist_test.py shape, applied to a transformer)."""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.models import encoder
from ai_edge_quantizer_tpu.utils.test_utils import BaseOpTestCase

_CFG = encoder.EncoderConfig(
    vocab_size=512, seq_len=16, embed_dim=64, num_layers=2,
    num_heads=2, ffn_dim=128, num_classes=8)


@pytest.fixture(scope='module')
def encoder_graph():
  return encoder.build_encoder(_CFG, batch=2)


class TestEncoderDynamic(BaseOpTestCase):

  def test_dynamic_int8(self, encoder_graph):
    qt, cmp_res = self.quantize_and_validate(
        encoder_graph, 'dynamic_wi8_afp32')
    self.assert_model_size_reduction_above_min(cmp_res, 0.5)
    sig = cmp_res.available_signature_keys()[0]
    self.assert_weights_errors_below_tolerance(cmp_res, 1e-2, sig)
    self.assert_output_errors_below_tolerance(cmp_res, 1e-2, sig)
    # Every projection weight landed int8.
    sg = qt._result.quantized_model.main_subgraph()
    for name in ('layer_0/attn/q/w', 'layer_1/mlp/down/w', 'pooler/w',
                 'classifier/w', 'embedder/w'):
      assert sg.tensor_by_name(name).dtype == 'int8', name

  def test_dynamic_int4_blockwise(self, encoder_graph):
    qt, cmp_res = self.quantize_and_validate(
        encoder_graph, 'dynamic_wi4_afp32_b32')
    sig = cmp_res.available_signature_keys()[0]
    res = cmp_res.get_signature_comparison_result(sig)
    # int4 blockwise is coarser; probs output still tracks fp32 closely.
    assert res.output_tensors['probs'] < 5e-2

  def test_weight_only_fp16(self, encoder_graph):
    qt, cmp_res = self.quantize_and_validate(
        encoder_graph, 'default_fp16')
    sig = cmp_res.available_signature_keys()[0]
    self.assert_output_errors_below_tolerance(cmp_res, 1e-4, sig)


class TestEncoderStaticRange(BaseOpTestCase):

  def test_srq_a8w8(self, encoder_graph):
    qt, cmp_res = self.quantize_and_validate(
        encoder_graph, 'default_a8w8', num_calibration_samples=8)
    sig = cmp_res.available_signature_keys()[0]
    res = cmp_res.get_signature_comparison_result(sig)
    # Softmax classifier output carries the fixed 1/256 scale; the class
    # distribution on a random-init model is near-uniform so error is tiny.
    assert res.output_tensors['probs'] < 1e-3
    # Attention-internal softmax tensors were quantized at fixed scale.
    sg = qt._result.quantized_model.main_subgraph()
    t = sg.tensor_by_name('layer_0/attn/probs')
    assert t.dtype == 'int8'
    assert np.isclose(float(np.asarray(t.quantization.scale)), 1.0 / 256)

  def test_srq_pooled_output_error(self, encoder_graph):
    _, cmp_res = self.quantize_and_validate(
        encoder_graph, 'default_a8w8', num_calibration_samples=8)
    sig = cmp_res.available_signature_keys()[0]
    res = cmp_res.get_signature_comparison_result(sig)
    assert res.output_tensors['pooled'] < 5e-3


def test_make_inputs_shapes():
  data = encoder.make_inputs(_CFG, batch=3)
  assert data['tokens'].shape == (3, _CFG.seq_len)
  assert data['positions'].shape == (3, _CFG.seq_len)
  assert data['tokens'].dtype == np.int32
