"""Calibrate-while-running wrapper test."""

import numpy as np

import fixtures
from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.pipeline import calibrator as calibrator_lib
from ai_edge_quantizer_tpu.utils import test_data as tdl


def test_runner_accumulates_qsvs_and_returns_outputs():
  g = fixtures.two_layer_mlp()
  qt = Quantizer(g, 'default_a8w8')
  calib = calibrator_lib.Calibrator(g)
  run = calib.signature_runner('serving_default', qt._recipe_manager)
  rng = np.random.default_rng(0)
  for _ in range(4):
    out = run({'x': rng.standard_normal((2, 64)).astype(np.float32)})
    assert 'out' in out and np.asarray(out['out']).shape == (2, 16)
  qsvs = calib.get_model_qsvs()
  assert 'dense1/out' in qsvs and 'min' in qsvs['dense1/out']
  # The collected QSVs drive a successful quantization.
  res = qt.quantize(qsvs)
  assert all(t.dtype.startswith('int')
             for t in res.quantized_model.main_subgraph().tensors)
