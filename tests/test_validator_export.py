"""Validator export formats: comparison JSON + Model-Explorer dump."""

import json

import fixtures
from ai_edge_quantizer_tpu import Quantizer


def test_save_comparison_and_model_explorer_json(tmp_path):
  g = fixtures.two_layer_mlp()
  qt = Quantizer(g, 'dynamic_wi8_afp32')
  qt.quantize()
  cmp_res = qt.validate(num_samples=2)
  cmp_res.save(str(tmp_path), 'model')

  report = json.loads((tmp_path / 'model_comparison_result.json').read_text())
  assert 'serving_default' in report
  sig = report['serving_default']
  assert sig['error_metric'] == 'mse'
  assert 'dense2/out' in sig['output_tensors']
  assert report['reduced_size_percentage'] > 60

  me = json.loads(
      (tmp_path / 'model_comparison_result_me_input.json').read_text())
  assert 'results' in me and 'thresholds' in me
  assert len(me['thresholds']) >= 1
  assert all('bgColor' in t for t in me['thresholds'])


class TestOutputBucketThroughRewriteTails:
  """Outputs gaining a (de)quantize tail must still land in the output
  bucket (pre-fix, the output bucket came back EMPTY for any model whose
  output was quantized: the renamed tensor exists only in the target)."""

  def test_srq_output_bucket_nonempty(self):
    import numpy as np
    from ai_edge_quantizer_tpu import Quantizer
    from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
    rng = np.random.default_rng(0)
    b = GraphBuilder('main')
    x = b.input('x', (2, 32))
    y = b.fully_connected(
        x, (rng.normal(size=(16, 32)) * 0.1).astype(np.float32),
        None, name='fc')
    b.output(y)
    g = b.finalize()
    qt = Quantizer(g, 'default_a8w8')
    qt.quantize(qt.calibrate(
        {'serving_default': [
            {'x': rng.standard_normal((2, 32)).astype(np.float32)}
            for _ in range(4)]}))
    comparison = qt.validate(num_samples=2)
    res = comparison.get_signature_comparison_result('serving_default')
    assert res.output_tensors, 'output bucket empty after rewrite tails'
