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
