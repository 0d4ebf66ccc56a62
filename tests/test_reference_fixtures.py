"""End-to-end interop with the reference's own .tflite model zoo.

Proof that recipes written for the reference (google-ai-edge/ai-edge-quantizer)
produce equivalent results here: each test loads one of the reference's
checked-in fixtures (`/root/reference/ai_edge_quantizer/tests/models/`)
through `graph/tflite_import.py`, quantizes it with a stock reference recipe,
and validates against the reference test suite's own thresholds
(ref `quantizer_test.py:511-769`, `tests/end_to_end_tests/*_test.py`).
"""

import os

import numpy as np
import pytest

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.algorithms.registry import AlgorithmName
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph import serialize as graph_serialize

FIXTURES = '/root/reference/ai_edge_quantizer/tests/models'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason='reference fixture zoo not present')


def _fixture(name: str) -> str:
  path = os.path.join(FIXTURES, name)
  if not os.path.exists(path):
    pytest.skip(f'fixture {name} not in reference checkout')
  return path


def _random_inputs(graph, sig_idx=0, seed=0):
  """Random test inputs for one signature, shaped from the IR."""
  rng = np.random.default_rng(seed)
  sig = graph.signatures[sig_idx]
  sg = graph.subgraphs[sig.subgraph_index]
  out = {}
  for name, tid in sig.inputs.items():
    t = sg.tensors[tid]
    if t.dtype == 'float32':
      out[name] = rng.random(t.shape, np.float32)
    elif t.dtype in ('int32', 'int64'):
      out[name] = rng.integers(0, 10, t.shape).astype(t.dtype)
    elif t.dtype == 'bool':
      out[name] = rng.integers(0, 2, t.shape).astype(np.bool_)
    else:
      raise AssertionError(f'unhandled input dtype {t.dtype}')
  return out


def _dataset(graph, num_samples=4):
  return {
      sig.signature_key: [
          _random_inputs(graph, i, seed=s) for s in range(num_samples)
      ]
      for i, sig in enumerate(graph.signatures)
  }


class TestConvFcMnist:
  """conv_fc_mnist.tflite — the reference's flagship small model.

  Mirrors ref `quantizer_test.py` QuantizerBytearrayInputs (bytearray
  input, default_af32w8float, validate) and the end-to-end MNIST tests.
  """

  def test_bytearray_input_weight_only_quantize_and_validate(self):
    path = _fixture('conv_fc_mnist.tflite')
    with open(path, 'rb') as f:
      content = bytearray(f.read())
    qt = Quantizer(content, 'default_af32w8float')
    res = qt.quantize()
    assert res.quantized_model is not None
    # int8 weights landed.
    dtypes = {t.dtype for sg in res.quantized_model.subgraphs
              for t in sg.tensors if t.buffer >= 0}
    assert 'int8' in dtypes
    cmp = qt.validate(num_samples=2).get_signature_comparison_result()
    # Ref fully_connected_test.py:49 asserts weight-only output MSE < 1e-2.
    assert all(v < 1e-2 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)

  def test_static_a8w8_calibrate_quantize_validate(self):
    path = _fixture('conv_fc_mnist.tflite')
    qt = Quantizer(path, 'default_a8w8')
    g = qt.float_model
    data = _dataset(g, num_samples=8)
    cr = qt.calibrate(data)
    res = qt.quantize(cr)
    assert res.quantized_model is not None
    # Validate on in-calibration-distribution data, like the ref e2e tests
    # (mnist samples for both calibrate and compare).
    cmp = qt.validate(data).get_signature_comparison_result()
    assert all(v < 1e-2 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)

  def test_int4_blockwise_size_reduction(self):
    """Ref fully_connected_test.py:83-110: int4 FC cuts model size >=50%."""
    path = _fixture('conv_fc_mnist.tflite')
    qt = Quantizer(path, 'dynamic_wi4_afp32')
    res = qt.quantize()
    before = graph_serialize.model_size_bytes(qt.float_model)
    after = graph_serialize.model_size_bytes(res.quantized_model)
    assert after < 0.5 * before, (before, after)


class TestToyGemmaKvCache:
  """toy_model_with_kv_cache_multi_signature.tflite — the KV-cache torture
  test (ref quantizer_test.py:690-769, QuantizerToyGemma2Test)."""

  @pytest.fixture(scope='class')
  def model_path(self):
    return _fixture('toy_model_with_kv_cache_multi_signature.tflite')

  def _calibration_dataset(self, graph):
    rng = np.random.default_rng(42)
    data = {}
    for i, sig in enumerate(graph.signatures):
      data[sig.signature_key] = [_random_inputs(graph, i, seed=7)]
    return data

  def test_quantization_succeeds_both_modes(self, model_path):
    # Ref parametrizes PRESERVE_ALL_TENSORS / PROFILER_BASED; the analogs
    # here are host capture and on-device stats reduction.
    for mode in ('capture', 'device_stats'):
      qt = Quantizer(model_path, 'default_a8w8')
      qt.update_quantization_recipe(
          regex='.*', operation_name=qtyping.OpName.OUTPUT,
          algorithm_key=AlgorithmName.NO_QUANTIZE)
      g = qt.float_model
      assert len(g.signatures) == 2, [s.signature_key for s in g.signatures]
      cr = qt.calibrate(self._calibration_dataset(g), calibration_mode=mode)
      assert cr
      res = qt.quantize(cr)
      assert res.quantized_model is not None

  def test_signature_outputs_stay_float(self, model_path):
    """Ref test_toy_gemma2_update_signature_defs_succeeds: with OUTPUT
    NO_QUANTIZE the exposed signature outputs remain float32."""
    qt = Quantizer(model_path, 'default_a8w8')
    qt.update_quantization_recipe(
        regex='.*', operation_name=qtyping.OpName.OUTPUT,
        algorithm_key=AlgorithmName.NO_QUANTIZE)
    g = qt.float_model
    cr = qt.calibrate(self._calibration_dataset(g))
    res = qt.quantize(cr)
    for sig in res.quantized_model.signatures:
      sg = res.quantized_model.subgraphs[sig.subgraph_index]
      for name, tid in sig.outputs.items():
        assert sg.tensors[tid].dtype == 'float32', (
            sig.signature_key, name, sg.tensors[tid].dtype)


class TestTwoSignatures:
  """two_signatures.tflite — multi-signature calibrate/quantize/validate
  (ref QuantizerMultiSignatureModelTest)."""

  @pytest.fixture(scope='class')
  def model_path(self):
    return _fixture('two_signatures.tflite')

  def test_explicit_calibration_quantize_validate_both_signatures(
      self, model_path):
    """The reference passes a hand-written QSV dict for this model (ref
    quantizer_test.py `_calibration_result`) because EMA calibration on
    scalar tensors collapses min==max; same dict works here verbatim."""
    qt = Quantizer(model_path, 'default_a8w8')
    g = qt.float_model
    keys = {s.signature_key for s in g.signatures}
    assert keys == {'add', 'multiply'}, keys
    calibration_result = {
        'add_x:0': {'min': -2.0, 'max': 2.0},
        'PartitionedCall:0': {'min': -8.0, 'max': 12.0},
        'multiply_x:0': {'min': -2.0, 'max': 2.0},
        'PartitionedCall_1:0': {'min': -20.0, 'max': 20.0},
    }
    res = qt.quantize(calibration_result)
    assert res.quantized_model is not None
    data = {
        'add': [{'x': np.array([2.0], np.float32)},
                {'x': np.array([-1.5], np.float32)}],
        'multiply': [{'x': np.array([1.0], np.float32)},
                     {'x': np.array([-2.0], np.float32)}],
    }
    val = qt.validate(data)
    assert set(val.available_signature_keys()) == {'add', 'multiply'}
    for key in ('add', 'multiply'):
      cmp = val.get_signature_comparison_result(key)
      assert all(v < 1e-2 for v in cmp.output_tensors.values()), (
          key, cmp.output_tensors)

  def test_insufficient_calibration_raises(self, model_path):
    """Calibrating only one signature must fail quantize with a clear
    error (ref test_quantization_with_insufficient_calibration)."""
    qt = Quantizer(model_path, 'default_a8w8')
    cr = qt.calibrate({'add': [{'x': np.array([2.0], np.float32)}]})
    with pytest.raises((ValueError, KeyError)):
      qt.quantize(cr)


class TestSingleOpFixtures:
  """Single-op reference fixtures through recipe-appropriate paths."""

  def test_single_fc_bias_static(self):
    path = _fixture('single_fc_bias.tflite')
    qt = Quantizer(path, 'default_a8w8')
    g = qt.float_model
    data = _dataset(g, num_samples=8)
    cr = qt.calibrate(data)
    qt.quantize(cr)
    cmp = qt.validate(data).get_signature_comparison_result()
    # Ref fully_connected_test.py:50 output tolerance for min-max: 1e-1.
    assert all(v < 1e-1 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)

  def test_single_depthwise_conv2d_static_channelwise(self):
    path = _fixture('single_depthwise_conv2d_bias.tflite')
    qt = Quantizer(path, 'default_a8w8')
    g = qt.float_model
    data = _dataset(g, num_samples=8)
    cr = qt.calibrate(data)
    qt.quantize(cr)
    cmp = qt.validate(data).get_signature_comparison_result()
    # Ref depthwise_conv2d_test.py:95: channelwise output MSE < 1e-4.
    assert all(v < 1e-4 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)

  def test_single_add_static(self):
    path = _fixture('single_add.tflite')
    qt = Quantizer(path, 'default_a8w8')
    g = qt.float_model
    data = _dataset(g, num_samples=8)
    cr = qt.calibrate(data)
    qt.quantize(cr)
    cmp = qt.validate(data).get_signature_comparison_result()
    # Ref add_test.py:89: a8w8 ADD output MSE < 1e-4.
    assert all(v < 1e-4 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)

  def test_embedding_lookup_weight_only(self):
    path = _fixture('embedding_lookup.tflite')
    qt = Quantizer(path)
    qt.add_weight_only_config(
        regex='.*', operation_name=qtyping.OpName.EMBEDDING_LOOKUP,
        num_bits=8)
    res = qt.quantize()
    dtypes = {t.dtype for sg in res.quantized_model.subgraphs
              for t in sg.tensors if t.buffer >= 0}
    assert 'int8' in dtypes
    key = qt.float_model.signatures[0].signature_key
    cmp = qt.validate(num_samples=2).get_signature_comparison_result(key)
    assert all(v < 1e-2 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)

  def test_bmm_dynamic(self):
    path = _fixture('bmm.tflite')
    qt = Quantizer(path, 'dynamic_wi8_afp32')
    res = qt.quantize()
    assert res.quantized_model is not None
    key = qt.float_model.signatures[0].signature_key
    cmp = qt.validate(num_samples=2).get_signature_comparison_result(key)
    assert all(v < 1e-2 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)


class TestWeightSharingFcs:
  """weight_sharing_fcs.tflite — two FCs share one weight buffer; the
  shared-buffer conflict handling must keep results correct
  (ref params_generator shared-buffer tests)."""

  def test_quantize_and_validate(self):
    path = _fixture('weight_sharing_fcs.tflite')
    qt = Quantizer(path, 'dynamic_wi8_afp32')
    res = qt.quantize()
    assert res.quantized_model is not None
    key = qt.float_model.signatures[0].signature_key
    cmp = qt.validate(num_samples=2).get_signature_comparison_result(key)
    assert all(v < 1e-2 for v in cmp.output_tensors.values()), (
        cmp.output_tensors)


def test_float_execution_parity_sample():
  """Imported fixtures execute: float outputs are finite and well-shaped
  for a representative sample of the zoo."""
  for name in ('single_tanh.tflite', 'single_mul.tflite',
               'single_slice.tflite', 'single_transpose.tflite'):
    path = _fixture(name)
    g = graph_serialize.load_model(path)
    sig = g.signatures[0]
    out = GraphExecutor(g).signature_runner(sig.signature_key)(
        _random_inputs(g))
    for v in out.values():
      assert np.all(np.isfinite(np.asarray(v, dtype=np.float32)))


class TestDequantizedWeightsFixtures:
  """dequantized_weights/*.tflite — float models whose weights were
  DEQUANTIZED from an int4 grid; DEQUANTIZED_WEIGHT_RECOVERY must get the
  original grid back losslessly (ref fully_connected_test.py:46-96,
  weight tolerance 1e-5)."""

  @pytest.mark.parametrize('name,granularity', [
      ('tensor_i4rangedvalues_fc.tflite', 'TENSORWISE'),
      ('channel_i4rangedvalues_fc.tflite', 'CHANNELWISE'),
  ])
  def test_recovery_weight_mse(self, name, granularity):
    path = _fixture(os.path.join('dequantized_weights', name))
    qt = Quantizer(path)
    qt.update_quantization_recipe(
        regex='.*', operation_name=qtyping.OpName.FULLY_CONNECTED,
        op_config=qtyping.OpQuantizationConfig(
            weight_tensor_config=qtyping.TensorQuantizationConfig(
                num_bits=4, symmetric=True,
                granularity=qtyping.QuantGranularity(granularity)),
            compute_precision=qtyping.ComputePrecision.FLOAT,
            explicit_dequantize=True),
        algorithm_key=AlgorithmName.DEQUANTIZED_WEIGHT_RECOVERY)
    res = qt.quantize()
    # Weight MSE vs the float original must be ~0 (exact grid recovery).
    float_g = graph_serialize.load_model(path)
    fsg = float_g.main_subgraph()
    qsg = res.quantized_model.main_subgraph()
    checked = 0
    for t in qsg.tensors:
      if not t.dtype.startswith('int') or t.quantization is None:
        continue
      orig = float_g.tensor_data(fsg.tensor_by_name(t.name))
      if orig is None:
        continue
      from ai_edge_quantizer_tpu.algorithms.uniform import (
          quant_numerics as qn)
      params = qtyping.UniformQuantParams(
          num_bits=t.quantization.num_bits,
          quantized_dimension=t.quantization.quantized_dimension,
          scale=np.asarray(t.quantization.scale),
          zero_point=np.asarray(t.quantization.zero_point),
          block_size=t.quantization.block_size)
      deq = qn.dequantize_array(
          np.asarray(res.quantized_model.tensor_data(t)), params)
      mse = float(np.mean((deq - np.asarray(orig)) ** 2))
      assert mse < 1e-5, (t.name, mse)
      checked += 1
    assert checked >= 1

  def test_recovery_size_reduction(self):
    """Ref asserts >= 80% size reduction for int4 weight-only."""
    path = _fixture('dequantized_weights/channel_i4rangedvalues_fc.tflite')
    qt = Quantizer(path)
    qt.update_quantization_recipe(
        regex='.*', operation_name=qtyping.OpName.FULLY_CONNECTED,
        op_config=qtyping.OpQuantizationConfig(
            weight_tensor_config=qtyping.TensorQuantizationConfig(
                num_bits=4, symmetric=True,
                granularity=qtyping.QuantGranularity.CHANNELWISE),
            compute_precision=qtyping.ComputePrecision.FLOAT,
            explicit_dequantize=True),
        algorithm_key=AlgorithmName.DEQUANTIZED_WEIGHT_RECOVERY)
    res = qt.quantize()
    before = graph_serialize.model_size_bytes(qt.float_model)
    after = graph_serialize.model_size_bytes(res.quantized_model)
    assert after <= 0.25 * before, (before, after)


class TestPreQuantizedAndErrorFixtures:

  def test_mnist_quantized_loads_and_executes(self):
    """A fully pre-quantized reference model imports with its params and
    executes through the simulated-quant contract."""
    path = _fixture('mnist_quantized.tflite')
    g = graph_serialize.load_model(path)
    quantized_tensors = [t for sg in g.subgraphs for t in sg.tensors
                         if t.quantization is not None]
    assert quantized_tensors
    sig = g.signatures[0]
    out = GraphExecutor(g).signature_runner(sig.signature_key)(
        _random_inputs(g))
    for v in out.values():
      assert np.isfinite(np.asarray(v, np.float32)).all()

  def test_partly_quantized_model_requantizes_with_warning(self):
    """Ref params_generator.py:42-47: partially-quantized input models
    re-quantize under a warning; pre-quantized tensors are untouched."""
    path = _fixture('partly_quantized_mnist.tflite')
    with pytest.warns(UserWarning, match='partially quantized'):
      qt = Quantizer(path, 'dynamic_wi8_afp32')
      res = qt.quantize()
    assert res.quantized_model is not None

  def test_duplicated_tensor_names_rejected(self):
    """Ref params_generator._check_tensor_names_are_unique: duplicate
    names are a hard error."""
    path = _fixture('duplicated_tensor_names.tflite')
    qt = Quantizer(path, 'dynamic_wi8_afp32')
    with pytest.raises(ValueError, match='unique|duplicate|Duplicate'):
      qt.quantize()

  def test_composite_model_quantizes(self):
    """sdpa_composite.tflite: STABLEHLO_COMPOSITE ops import with their
    side-effect subgraphs and non-quantizable composites stay float
    (ref default policy composite whitelist)."""
    path = _fixture('sdpa_composite.tflite')
    g = graph_serialize.load_model(path)
    comps = [op for sg in g.subgraphs for op in sg.ops
             if op.opcode == 'STABLEHLO_COMPOSITE']
    assert comps
    qt = Quantizer(g, 'dynamic_wi8_afp32')
    res = qt.quantize()
    assert res.quantized_model is not None


def test_cli_quantizes_reference_tflite(tmp_path):
  """The aeqt CLI ingests the reference's .tflite directly (.tflite in,
  .aeqg + recipe JSON out) — the one-command migration path."""
  import subprocess
  import sys
  path = _fixture('conv_fc_mnist.tflite')
  r = subprocess.run(
      [sys.executable, '-m', 'ai_edge_quantizer_tpu.cli',
       '--model_file', path, '--recipe', 'dynamic_wi8_afp32',
       '--output_dir', str(tmp_path)],
      capture_output=True, text=True, timeout=240,
      env={**os.environ, 'PYTHONPATH': os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), 'JAX_PLATFORMS': 'cpu'})
  assert r.returncode == 0, r.stderr[-2000:]
  assert (tmp_path / 'conv_fc_mnist.aeqg').exists()
  assert (tmp_path / 'conv_fc_mnist_recipe.json').exists()
