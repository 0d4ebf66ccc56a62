"""On-device calibration statistics mode (executor.stats_runner +
Calibrator(mode='device_stats')) — the profiler-based calibrator analog."""

import numpy as np

from ai_edge_quantizer_tpu import Quantizer, qtyping
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.pipeline import calibrator as calibrator_lib
from ai_edge_quantizer_tpu.recipe import recipe_manager as rm
from ai_edge_quantizer_tpu.utils import test_data as tdl
from tests import fixtures


def _recipe(algorithm='min_max_uniform_quantize'):
  mgr = rm.RecipeManager()
  mgr.add_quantization_config(
      '.*', qtyping.OpName.ALL_SUPPORTED,
      qtyping.OpQuantizationConfig(
          activation_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=8, symmetric=False),
          weight_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=8, symmetric=True),
          compute_precision=qtyping.ComputePrecision.INTEGER),
      algorithm_key=algorithm)
  return mgr


class TestStatsRunner:

  def test_min_max_matches_host(self):
    graph = fixtures.two_layer_mlp()
    ex = GraphExecutor(graph)
    sample = tdl.create_random_dataset(graph, num_samples=1)
    sig_key, samples = next(iter(sample.items()))
    capture = ex.signature_runner(sig_key, capture_all=True)(samples[0])
    stats = ex.stats_runner(sig_key)(samples[0])
    sg = graph.main_subgraph()
    consts = {t.name for t in sg.tensors
              if t.buffer >= 0 and graph.buffers[t.buffer].data is not None}
    checked = 0
    for name, qsv in stats.items():
      assert name not in consts
      v = np.asarray(capture[name], np.float32)
      np.testing.assert_allclose(qsv['min'].ravel()[0], v.min(), rtol=1e-6)
      np.testing.assert_allclose(qsv['max'].ravel()[0], v.max(), rtol=1e-6)
      checked += 1
    assert checked >= 3  # input, hidden activation(s), output

  def test_hessian_matches_host(self):
    graph = fixtures.two_layer_mlp()
    ex = GraphExecutor(graph)
    data = tdl.create_random_dataset(graph, num_samples=1)
    sig_key, samples = next(iter(data.items()))
    capture = ex.signature_runner(sig_key, capture_all=True)(samples[0])
    sg = graph.main_subgraph()
    # Pick the FC input activation tensor.
    fc = next(op for op in sg.ops if op.opcode == 'FULLY_CONNECTED')
    act_name = sg.tensors[fc.inputs[0]].name
    stats = ex.stats_runner(sig_key, hessian_tensor_names={act_name})(
        samples[0])
    x = np.asarray(capture[act_name], np.float32)
    x2 = x.reshape(-1, x.shape[-1])
    want = (2.0 / x.shape[0]) * (x2.T @ x2)
    np.testing.assert_allclose(stats[act_name]['hessian'], want,
                               rtol=1e-4, atol=1e-5)


class TestDeviceStatsCalibrator:

  def test_qsvs_match_capture_mode(self):
    graph = fixtures.two_layer_mlp()
    mgr = _recipe()
    data = tdl.create_random_dataset(graph, num_samples=4)
    host = calibrator_lib.Calibrator(graph, mode='capture')
    host.calibrate(data, mgr)
    dev = calibrator_lib.Calibrator(graph, mode='device_stats')
    dev.calibrate(data, mgr)
    h_qsvs, d_qsvs = host.get_model_qsvs(), dev.get_model_qsvs()
    assert set(h_qsvs) == set(d_qsvs)
    for name in h_qsvs:
      np.testing.assert_allclose(
          np.asarray(d_qsvs[name]['min']), np.asarray(h_qsvs[name]['min']),
          rtol=1e-5, atol=1e-6, err_msg=name)
      np.testing.assert_allclose(
          np.asarray(d_qsvs[name]['max']), np.asarray(h_qsvs[name]['max']),
          rtol=1e-5, atol=1e-6, err_msg=name)

  def test_gptq_hessians_match_capture_mode(self):
    graph = fixtures.two_layer_mlp()
    mgr = _recipe(algorithm='GPTQ')
    data = tdl.create_random_dataset(graph, num_samples=3)
    host = calibrator_lib.Calibrator(graph, mode='capture')
    host.calibrate(data, mgr)
    dev = calibrator_lib.Calibrator(graph, mode='device_stats')
    dev.calibrate(data, mgr)
    h_qsvs, d_qsvs = host.get_model_qsvs(), dev.get_model_qsvs()
    checked = 0
    for name, qsv in h_qsvs.items():
      if isinstance(qsv, dict) and 'hessian' in qsv:
        np.testing.assert_allclose(
            np.asarray(d_qsvs[name]['hessian']), np.asarray(qsv['hessian']),
            rtol=1e-4, atol=1e-5, err_msg=name)
        assert d_qsvs[name]['num_samples'] == qsv['num_samples']
        checked += 1
    assert checked >= 1

  def test_full_quantize_through_device_stats(self):
    graph = fixtures.two_layer_mlp()
    qt = Quantizer(graph, 'default_a8w8')
    data = tdl.create_random_dataset(graph, num_samples=4)
    qsvs = qt.calibrate(data, calibration_mode='device_stats')
    res = qt.quantize(qsvs)
    assert any(t.dtype == 'int8'
               for t in res.quantized_model.main_subgraph().tensors)
    r = qt.validate(num_samples=2).get_signature_comparison_result(
        graph.signatures[0].signature_key)
    assert all(v < 5e-2 for v in r.output_tensors.values())

  def test_unknown_mode_raises(self):
    import pytest
    with pytest.raises(ValueError):
      calibrator_lib.Calibrator(fixtures.two_layer_mlp(), mode='bogus')


def test_composite_model_falls_back_to_capture():
  """device_stats must still calibrate composite inner tensors (fallback)."""
  import importlib
  comp_tests = importlib.import_module('test_composites')
  graph = comp_tests._composite_model()
  mgr = _recipe()
  data = tdl.create_random_dataset(graph, num_samples=2)
  host = calibrator_lib.Calibrator(graph, mode='capture')
  host.calibrate(data, mgr)
  dev = calibrator_lib.Calibrator(graph, mode='device_stats')
  dev.calibrate(data, mgr)
  assert set(host.get_model_qsvs()) == set(dev.get_model_qsvs())


def test_inference_only_mode_refuses_calibration():
  import pytest
  from tests import fixtures
  calib = calibrator_lib.Calibrator(fixtures.two_layer_mlp(),
                                    mode='inference_only')
  with pytest.raises(NotImplementedError):
    calib.calibrate({'serving_default': []}, None)
