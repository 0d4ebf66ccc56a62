"""End-to-end quantize -> execute -> validate tests (the analog of the
reference's tests/end_to_end_tests tier)."""

import os
import tempfile

import numpy as np
import pytest

import fixtures
from ai_edge_quantizer_tpu import Quantizer, qtyping
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph import serialize
from ai_edge_quantizer_tpu.utils import test_data as test_data_lib


def _run_both(float_graph, quantized_graph, seed=7):
  rng = np.random.default_rng(seed)
  sig = float_graph.signatures[0]
  sg = float_graph.subgraphs[sig.subgraph_index]
  inputs = {}
  for name, tid in sig.inputs.items():
    t = sg.tensors[tid]
    inputs[name] = rng.standard_normal(size=t.shape).astype(np.float32)
  f = GraphExecutor(float_graph).signature_runner()(inputs)
  q = GraphExecutor(quantized_graph).signature_runner()(inputs)
  return f, q


class TestDynamicRange:

  def test_int8_channelwise(self):
    g = fixtures.two_layer_mlp()
    qt = Quantizer(g, 'dynamic_wi8_afp32')
    res = qt.quantize()
    cmp = qt.validate(num_samples=2)
    r = cmp.get_signature_comparison_result()
    assert r.output_tensors['dense2/out'] < 1e-2
    # Weight error well under reference threshold 1e-2.
    assert all(v < 1e-2 for v in r.constant_tensors.values())
    _, frac = cmp.get_model_size_reduction()
    assert frac > 0.65

  def test_int4_blockwise(self):
    g = fixtures.single_fc()
    qt = Quantizer(g, 'dynamic_wi4_afp32_b32')
    res = qt.quantize()
    w = res.quantized_model.main_subgraph().tensor_by_name('fc/w')
    assert w.dtype == 'int4'
    assert w.quantization.block_size == 32
    _, frac = qt.validate(num_samples=2).get_model_size_reduction()
    assert frac > 0.75  # reference int4 blockwise threshold

  def test_min_weight_elements_skips_small(self):
    g = fixtures.two_layer_mlp()  # dense2 weight 16*32=512 < 1024
    qt = Quantizer(g, 'dynamic_legacy_wi8_afp32')
    res = qt.quantize()
    sg = res.quantized_model.main_subgraph()
    assert sg.tensor_by_name('dense1/w').dtype == 'int8'  # 2048 elems
    assert sg.tensor_by_name('dense2/w').dtype == 'float32'  # 512 elems


class TestWeightOnly:

  @pytest.mark.parametrize('recipe,bits,min_reduction', [
      ('default_af32w8float', 'int8', 0.65),
      ('default_af32w4float', 'int4', 0.80),
  ])
  def test_weight_only(self, recipe, bits, min_reduction):
    g = fixtures.single_fc()
    qt = Quantizer(g, recipe)
    res = qt.quantize()
    sg = res.quantized_model.main_subgraph()
    assert sg.tensor_by_name('fc/w').dtype == bits
    # Explicit dequantize op present.
    assert any(op.opcode == 'DEQUANTIZE' for op in sg.ops)
    cmp = qt.validate(num_samples=2)
    r = cmp.get_signature_comparison_result()
    assert r.constant_tensors['fc/w'] < 1e-2
    _, frac = cmp.get_model_size_reduction()
    assert frac > min_reduction


class TestStaticRange:

  def _calib(self, g, n=20, seed=1):
    return test_data_lib.create_random_dataset(g, num_samples=n, seed=seed)

  def test_a8w8_all_tensors_integer(self):
    g = fixtures.two_layer_mlp(in_dim=256, hidden=128, out_dim=32, batch=4)
    qt = Quantizer(g, 'default_a8w8')
    assert qt.need_calibration
    cr = qt.calibrate(self._calib(g))
    res = qt.quantize(cr)
    sg = res.quantized_model.main_subgraph()
    for t in sg.tensors:
      assert t.dtype.startswith('int'), f'{t.name} is {t.dtype}'
    # Output noise must be small RELATIVE to signal power (SNR > 100);
    # absolute MSE scales with this fixture's large activation magnitudes.
    cmp_snr = qt.validate(num_samples=4, error_metrics='snr')
    snr = cmp_snr.get_signature_comparison_result().output_tensors[
        'dense2/out']
    assert snr > 100, snr

  def test_a16w8_dtypes(self):
    g = fixtures.two_layer_mlp(in_dim=256, hidden=128, out_dim=32, batch=4)
    qt = Quantizer(g, 'default_a16w8')
    cr = qt.calibrate(self._calib(g))
    res = qt.quantize(cr)
    sg = res.quantized_model.main_subgraph()
    assert sg.tensor_by_name('x').dtype == 'int16'
    assert sg.tensor_by_name('dense1/w').dtype == 'int8'
    assert sg.tensor_by_name('dense1/b').dtype == 'int64'

  def test_quantize_without_calibration_raises(self):
    g = fixtures.two_layer_mlp()
    qt = Quantizer(g, 'default_a8w8')
    with pytest.raises(RuntimeError, match='QSV'):
      qt.quantize()

  def test_calibration_save_resume(self, tmp_path):
    g = fixtures.two_layer_mlp()
    qt = Quantizer(g, 'default_a8w8')
    cr1 = qt.calibrate(self._calib(g, n=4))
    from ai_edge_quantizer_tpu.utils import calibration_utils
    path = str(tmp_path / 'calib.json')
    calibration_utils.save_qsvs_to_json(cr1, path, num_samples=4)
    loaded, meta = calibration_utils.load_qsvs_from_json(path)
    assert meta['num_samples_calibrated'] == 4
    np.testing.assert_allclose(loaded['dense1/out']['max'],
                               cr1['dense1/out']['max'])
    cr2 = qt.calibrate(self._calib(g, n=2, seed=9),
                       previous_calibration_result=loaded)
    assert set(cr2) == set(cr1)

  def test_resume_from_path_restores_sample_count(self, tmp_path):
    """A resumed calibrator keeps accumulating num_samples_calibrated
    (reference calibrator.py:354-369 resume-metadata contract)."""
    from ai_edge_quantizer_tpu.pipeline import calibrator as calibrator_lib
    from ai_edge_quantizer_tpu.recipe import recipe_manager as rm_lib
    from ai_edge_quantizer_tpu.recipe import recipe as recipe_lib
    from ai_edge_quantizer_tpu.utils import calibration_utils
    g = fixtures.two_layer_mlp()
    manager = rm_lib.RecipeManager()
    manager.load_quantization_recipe(recipe_lib.default_a8w8())
    calib1 = calibrator_lib.Calibrator(g)
    calib1.calibrate(self._calib(g, n=3), manager)
    assert calib1.get_num_samples_calibrated() == 3
    path = str(tmp_path / 'resume.json')
    calib1.save_calibration_result(path, extra_metadata={'run': 'first'})
    _, meta = calibration_utils.load_qsvs_from_json(path)
    assert meta == {'num_samples_calibrated': 3, 'run': 'first'}
    calib2 = calibrator_lib.Calibrator(g)
    calib2.load_model_qsvs(path)
    assert calib2.get_num_samples_calibrated() == 3
    calib2.calibrate(self._calib(g, n=2, seed=5), manager)
    assert calib2.get_num_samples_calibrated() == 5
    calib2.save_calibration_result(path)
    _, meta2 = calibration_utils.load_qsvs_from_json(path)
    assert meta2['num_samples_calibrated'] == 5
    calib2.reset_model_qsvs()
    assert calib2.get_num_samples_calibrated() == 0
    assert calib2.get_model_qsvs() == {}


class TestMnistClassModel:

  def test_conv_model_static(self):
    g = fixtures.conv_fc_mnist()
    qt = Quantizer(g, 'default_a8w8')
    cr = qt.calibrate(test_data_lib.create_random_dataset(g, num_samples=10))
    res = qt.quantize(cr)
    sg = res.quantized_model.main_subgraph()
    # All tensors integer under SRQ (reference mnist_test expectation).
    for t in sg.tensors:
      assert t.dtype.startswith('int'), f'{t.name}: {t.dtype}'
    cmp = qt.validate(num_samples=2)
    # Softmax output: fixed scale 1/256.
    probs = sg.tensor_by_name('probs')
    np.testing.assert_allclose(np.asarray(probs.quantization.scale),
                               1.0 / 256)
    assert cmp.get_all_tensor_results()['probs'] < 1e-2

  def test_conv_model_dynamic(self):
    g = fixtures.conv_fc_mnist()
    qt = Quantizer(g, 'dynamic_wi8_afp32')
    qt.quantize()
    r = qt.validate(num_samples=2).get_signature_comparison_result()
    assert r.output_tensors['probs'] < 1e-3


class TestSharedWeights:

  def test_shared_tensor_same_config_no_duplication(self):
    g = fixtures.shared_weight_two_fc()
    qt = Quantizer(g, 'dynamic_wi8_afp32')
    res = qt.quantize()
    sg = res.quantized_model.main_subgraph()
    # Same config for both consumers: weight quantized once, no duplicate.
    assert sg.tensor_by_name('shared/w').dtype == 'int8'
    assert sg.tensor_by_name('shared/w_duplicated_1') is None

  def test_shared_tensor_conflicting_configs_duplicates(self):
    g = fixtures.shared_weight_two_fc()
    qt = Quantizer(g)
    qt.add_dynamic_config('fc1.*', 'FULLY_CONNECTED', 8)
    qt.add_weight_only_config('fc2.*', 'FULLY_CONNECTED', 4)
    res = qt.quantize()
    sg = res.quantized_model.main_subgraph()
    names = [t.name for t in sg.tensors]
    assert any('duplicated' in n for n in names), names
    f, q = _run_both(g, res.quantized_model)
    mse = float(np.mean((np.asarray(f['out']) - np.asarray(q['out'])) ** 2))
    assert mse < 1e-1

  def test_shared_buffer_conflicting_configs_duplicates_buffer(self):
    g = fixtures.shared_buffer_two_tensors()
    qt = Quantizer(g)
    qt.add_dynamic_config('fc1.*', 'FULLY_CONNECTED', 8)
    qt.add_weight_only_config('fc2.*', 'FULLY_CONNECTED', 4)
    res = qt.quantize()
    sg = res.quantized_model.main_subgraph()
    wa, wb = sg.tensor_by_name('w_a'), sg.tensor_by_name('w_b')
    assert wa.buffer != wb.buffer
    assert wa.dtype == 'int8' and wb.dtype == 'int4'


class TestSerialization:

  def test_roundtrip_exact(self, tmp_path):
    g = fixtures.two_layer_mlp()
    qt = Quantizer(g, 'dynamic_wi8_afp32')
    res = qt.quantize()
    path = str(tmp_path / 'm.aeqg')
    res.export_model(path)
    g2 = serialize.load_graph(path)
    f1, _ = _run_both(g, res.quantized_model)
    q1 = GraphExecutor(res.quantized_model).signature_runner()
    q2 = GraphExecutor(g2).signature_runner()
    rng = np.random.default_rng(3)
    inp = {'x': rng.standard_normal((2, 64)).astype(np.float32)}
    np.testing.assert_array_equal(
        np.asarray(q1(inp)['out']), np.asarray(q2(inp)['out']))

  def test_previous_quantized_model_validation(self, tmp_path):
    g = fixtures.two_layer_mlp()
    qt = Quantizer(g, 'dynamic_wi8_afp32')
    res = qt.quantize()
    path = str(tmp_path / 'm.aeqg')
    res.export_model(path)
    qt2 = Quantizer(g, previous_quantized_model=path)
    r = qt2.validate(num_samples=1).get_signature_comparison_result()
    assert r.output_tensors['dense2/out'] < 1e-2


class TestInt2:

  def test_int2_dynamic_fc(self):
    g = fixtures.single_fc()
    qt = Quantizer(g, 'dynamic_wi2_afp32')
    res = qt.quantize()
    w = res.quantized_model.main_subgraph().tensor_by_name('fc/w')
    assert w.dtype == 'int2'
    _, frac = qt.validate(num_samples=2).get_model_size_reduction()
    assert frac > 0.85  # 2-bit weights: >85% size cut
    # int2 survives the packed serialization round trip.
    import tempfile, os as _os
    d = tempfile.mkdtemp()
    res.export_model(_os.path.join(d, 'm.aeqg'))
    g2 = serialize.load_graph(_os.path.join(d, 'm.aeqg'))
    import numpy as _np
    _np.testing.assert_array_equal(
        _np.array(g2.tensor_data(g2.main_subgraph().tensor_by_name('fc/w'))),
        _np.array(res.quantized_model.tensor_data(w)))


class TestMultiSignatureSerialization:

  def test_gemma_roundtrip_with_shared_buffers(self, tmp_path):
    from ai_edge_quantizer_tpu.models import gemma
    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=1, prefill_len=4)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    res = qt.quantize()
    path = str(tmp_path / 'gemma.aeqg')
    res.export_model(path)
    g2 = serialize.load_graph(path)
    assert g2.signature_keys() == ['prefill', 'decode']
    # Shared weight buffers stay shared after the round trip.
    from ai_edge_quantizer_tpu.graph import ir as _ir
    b2t = _ir.buffer_to_tensors(g2)
    shared = [refs for refs in b2t.values() if len(refs) > 1]
    assert shared, 'expected prefill/decode to share weight buffers'
    inp = gemma.make_inputs(cfg, 'decode', 1, 1, start_pos=2)
    y1 = GraphExecutor(res.quantized_model).signature_runner('decode')(inp)
    y2 = GraphExecutor(g2).signature_runner('decode')(inp)
    np.testing.assert_array_equal(np.asarray(y1['logits']),
                                  np.asarray(y2['logits']))


class TestMixedAlgorithmRecipe:
  """One graph, three algorithms selected by scope — the selective-
  quantization workflow (ref selective_quantization_isnet colab)."""

  def test_scope_mixed_octav_gptq_minmax(self):
    graph = fixtures.conv_fc_mnist()
    qt = Quantizer(graph)
    # Default: everything min-max int8 DRQ.
    qt.add_dynamic_config('.*', qtyping.OpName.ALL_SUPPORTED, num_bits=8)
    # Convs: OCTAV int8.
    qt.update_quantization_recipe(
        '.*conv.*', 'CONV_2D',
        qtyping.OpQuantizationConfig(
            weight_tensor_config=qtyping.TensorQuantizationConfig(
                num_bits=8, symmetric=True),
            compute_precision=qtyping.ComputePrecision.INTEGER),
        algorithm_key='OCTAV')
    # Final FC: GPTQ int4 (needs calibration).
    qt.update_quantization_recipe(
        '.*fc2.*', 'FULLY_CONNECTED',
        qtyping.OpQuantizationConfig(
            weight_tensor_config=qtyping.TensorQuantizationConfig(
                num_bits=4, symmetric=True),
            compute_precision=qtyping.ComputePrecision.INTEGER),
        algorithm_key='GPTQ')
    assert qt.need_calibration
    data = test_data_lib.create_random_dataset(graph, num_samples=4)
    res = qt.quantize(qt.calibrate(data))
    sg = res.quantized_model.main_subgraph()
    dtypes = {t.name: t.dtype for t in sg.tensors if t.buffer >= 0}
    int4 = [n for n, d in dtypes.items() if d == 'int4']
    int8 = [n for n, d in dtypes.items() if d == 'int8']
    assert any('fc2' in n for n in int4), int4
    assert int8
    r = qt.validate(num_samples=2).get_signature_comparison_result(
        graph.signatures[0].signature_key)
    assert all(v < 5e-2 for v in r.output_tensors.values()), r.output_tensors


class TestQuantizerInputForms:

  def test_bytes_input_aeqg(self, tmp_path):
    g = fixtures.two_layer_mlp()
    path = str(tmp_path / 'm.aeqg')
    serialize.save_graph(g, path)
    data = open(path, 'rb').read()
    qt = Quantizer(bytearray(data), 'dynamic_wi8_afp32')
    res = qt.quantize()
    assert any(t.dtype == 'int8'
               for t in res.quantized_model.main_subgraph().tensors)

  def test_bad_bytes_raises(self):
    with pytest.raises(ValueError, match='Unrecognized'):
      Quantizer(b'\x00' * 64)

  def test_insufficient_calibration_raises(self):
    g = fixtures.two_layer_mlp()
    qt = Quantizer(g, 'default_a8w8')
    assert qt.need_calibration
    # QSVs for only one tensor: quantize must refuse.
    with pytest.raises(ValueError, match='calibration'):
      qt.quantize({'x': {'min': np.zeros((1, 1)), 'max': np.ones((1, 1))}})


def test_save_over_mmap_loaded_source(tmp_path):
  """Quantize a zero-copy-loaded .aeqg and save back to the SAME path.

  The save must not truncate pages still referenced by the source
  graph's mmap (atomic-rename write; a plain overwrite SIGBUSes)."""
  g = fixtures.two_layer_mlp()
  path = str(tmp_path / 'm.aeqg')
  serialize.save_graph(g, path)
  loaded = serialize.load_graph(path, zero_copy=True)
  qt = Quantizer(loaded, 'dynamic_wi8_afp32')
  res = qt.quantize()
  serialize.save_graph(res.quantized_model, path)  # same path
  # Original mmap-backed graph still fully readable.
  assert all(
      b.data is None or np.asarray(b.data).size >= 0
      for b in loaded.buffers)
  np.testing.assert_array_equal(
      np.asarray(loaded.buffers[0].data),
      np.asarray(g.buffers[0].data))
  again = serialize.load_graph(path)
  assert any(t.dtype == 'int8' for t in again.main_subgraph().tensors)


class TestPartiallyPreQuantized:
  """Feeding a partially-quantized model back through Quantizer.

  Reference behavior (params_generator.py:42-47): warn, leave tensors that
  already carry quantization untouched, and quantize the rest."""

  def test_requantize_weight_only_output_with_srq(self):
    import warnings as warnings_lib

    g = fixtures.two_layer_mlp(in_dim=256, hidden=128, out_dim=32, batch=4)
    first = Quantizer(g, 'default_af32w8float').quantize().quantized_model
    w1 = first.main_subgraph().tensor_by_name('dense1/w')
    assert w1.dtype == 'int8'
    scale_before = np.asarray(w1.quantization.scale).copy()

    qt2 = Quantizer(first, 'default_a8w8')
    data = test_data_lib.create_random_dataset(first, num_samples=8)
    cr = qt2.calibrate(data)
    with warnings_lib.catch_warnings(record=True) as caught:
      warnings_lib.simplefilter('always')
      res = qt2.quantize(cr)
    assert any('partially quantized' in str(w.message) for w in caught)

    sg = res.quantized_model.main_subgraph()
    # Pre-quantized weights untouched: same storage dtype, same scale — no
    # double quantization.
    w_after = sg.tensor_by_name('dense1/w')
    assert w_after.dtype == 'int8'
    np.testing.assert_array_equal(
        np.asarray(w_after.quantization.scale), scale_before)
    # The float activations DID get SRQ-quantized in the second pass.
    assert sg.tensor_by_name('x').dtype == 'int8'
    # The requantized model still runs and tracks the first-pass model
    # closely (validator dequantizes the SRQ outputs for comparison).
    snr = qt2.validate(num_samples=4, error_metrics='snr') \
        .get_signature_comparison_result().output_tensors['dense2/out']
    assert snr > 50, snr

  def test_float_model_emits_no_warning(self):
    import warnings as warnings_lib

    g = fixtures.two_layer_mlp()
    with warnings_lib.catch_warnings(record=True) as caught:
      warnings_lib.simplefilter('always')
      Quantizer(g, 'dynamic_wi8_afp32').quantize()
    assert not any('partially quantized' in str(w.message) for w in caught)
