"""Measure the reference's test-enforced accuracy/size baselines here.

Runs each BASELINE.md row's configuration through the full
quantize->validate pipeline on CPU and prints measured value vs the
reference's threshold (ref thresholds from
/root/reference/ai_edge_quantizer/tests/end_to_end_tests/*). Output is
the source for docs/ACCURACY.md.

Run: python scripts/accuracy_report.py
"""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, '.')
sys.path.insert(0, 'tests')

import numpy as np  # noqa: E402

import fixtures  # noqa: E402
from ai_edge_quantizer_tpu import Quantizer, qtyping  # noqa: E402
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder  # noqa: E402
from ai_edge_quantizer_tpu.utils import test_data as tdata  # noqa: E402
from ai_edge_quantizer_tpu.utils import test_utils  # noqa: E402

ROWS = []


def _row(name, measured, threshold, kind):
  ok = measured >= threshold if kind == '>=' else measured < threshold
  ROWS.append((name, measured, kind, threshold, ok))
  print(f'{name:52s} {measured:>12.3e}  (want {kind} {threshold:g}) '
        f'{"OK" if ok else "FAIL"}', flush=True)


def _metrics(comparison):
  """(size_reduction_fraction, max weight MSE, max output MSE)."""
  sig = comparison.available_signature_keys()[0]
  res = comparison.get_signature_comparison_result(sig)
  _, size_frac = comparison.get_model_size_reduction()
  w_err = max(res.constant_tensors.values()) if res.constant_tensors else 0.0
  o_err = max(res.output_tensors.values()) if res.output_tensors else 0.0
  return size_frac, w_err, o_err


def _summarize(qt):
  return _metrics(qt.validate(num_samples=4, error_metrics='mse'))


def _run(model, recipe):
  _, comparison = test_utils.BaseOpTestCase.quantize_and_validate(
      model, recipe)
  return _metrics(comparison)


def _run_algorithm(model, algorithm_key, num_bits, weight_only=False):
  qt = Quantizer(model)
  qt.update_quantization_recipe(
      '.*', 'FULLY_CONNECTED',
      qtyping.OpQuantizationConfig(
          weight_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=num_bits, symmetric=True,
              granularity=qtyping.QuantGranularity.CHANNELWISE),
          compute_precision=(qtyping.ComputePrecision.FLOAT if weight_only
                             else qtyping.ComputePrecision.INTEGER),
          explicit_dequantize=weight_only),
      algorithm_key=algorithm_key)
  calib = None
  if qt.need_calibration:
    calib = qt.calibrate(tdata.create_random_dataset(
        qt.float_model, num_samples=16))
  qt.quantize(calib)
  return _summarize(qt)


def _grid_fc():
  """QAT-style model: fp32 weights that sit exactly on an int4 grid."""
  rng = np.random.default_rng(7)
  grid = rng.integers(-7, 8, size=(256, 256)).astype(np.float32)
  scales = (rng.random((256, 1)) * 0.02 + 0.005).astype(np.float32)
  b = GraphBuilder('main')
  x = b.input('x', (2, 256))
  y = b.fully_connected(x, grid * scales, None, name='fc')
  b.output(y)
  return b.finalize()


def main():
  fc = fixtures.single_fc(in_dim=256, out_dim=256)

  size, werr, _ = _run(fc, 'dynamic_wi4_afp32')
  _row('int4 weight FC: model size reduction', size, 0.80, '>=')
  _row('int4 weight FC (min-max): weight MSE', werr, 1e-2, '<')

  size, werr, _ = _run(fc, 'dynamic_wi8_afp32')
  _row('int8 weight FC: model size reduction', size, 0.65, '>=')
  _row('int8 weight FC (min-max): weight MSE', werr, 1e-2, '<')

  size, _, _ = _run(fc, 'dynamic_wi4_afp32_b32')
  _row('int4 blockwise-32 dynamic FC: size reduction', size, 0.75, '>=')

  _, werr, _ = _run_algorithm(fc, 'OCTAV', 4)
  _row('int4 weight FC (OCTAV): weight MSE', werr, 1e-3, '<')

  # Reference row uses weight-only mode (explicit dequantize): the
  # recovered grid is exact, so outputs match fp32 bit-for-bit
  # (ref fully_connected_test.py:68-85, tolerance 1e-5).
  _, werr, oerr = _run_algorithm(
      _grid_fc(), 'dequantized_weight_recovery', 4, weight_only=True)
  _row('dequant-recovery: weight MSE', werr, 1e-5, '<')
  _row('dequant-recovery: output MSE', oerr, 1e-5, '<')

  # Reference row is a single elementwise op on uniform [0,1) data
  # (ref add_test.py:40-44,89 — _RNG.uniform inputs, tolerance 1e-4).
  b = GraphBuilder('main')
  x1 = b.input('x1', (8, 256))
  x2 = b.input('x2', (8, 256))
  y = b.binary('ADD', x1, x2, name='y')
  b.output(y)
  add_graph = b.finalize()
  rng = np.random.default_rng(66)
  data = [{'x1': rng.uniform(size=(8, 256)).astype(np.float32),
           'x2': rng.uniform(size=(8, 256)).astype(np.float32)}
          for _ in range(8)]
  qt = Quantizer(add_graph, 'default_a8w8')
  qt.quantize(qt.calibrate({'serving_default': data}))
  comparison = qt.validate(test_data={'serving_default': data[:4]},
                           error_metrics='mse')
  _, _, oerr = _metrics(comparison)
  _row('static a8w8 elementwise ADD: output MSE', oerr, 1e-4, '<')

  # Reference row is a single conv op, channelwise weights
  # (ref depthwise_conv2d_test.py:95-96 / conv2d tests, tolerance 1e-4).
  rng = np.random.default_rng(3)
  b = GraphBuilder('main')
  x = b.input('x', (1, 16, 16, 8))
  y = b.conv2d(x, (rng.normal(size=(8, 3, 3, 8)) * 0.05).astype(np.float32),
               (rng.normal(size=8) * 0.1).astype(np.float32),
               stride=1, padding='SAME', name='conv')
  b.output(y)
  _, _, oerr = _run(b.finalize(), 'default_a8w8')
  _row('static a8w8 conv2d (channelwise): output MSE', oerr, 1e-4, '<')

  print()
  failed = [r for r in ROWS if not r[4]]
  print(f'{len(ROWS) - len(failed)}/{len(ROWS)} baselines met.')
  return 1 if failed else 0


if __name__ == '__main__':
  sys.exit(main())
