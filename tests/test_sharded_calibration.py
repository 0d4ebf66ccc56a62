"""Data-parallel calibration shard/merge tests (parallel/calibration)."""

import numpy as np

from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.parallel import calibration as shard_calib
from ai_edge_quantizer_tpu.pipeline import calibrator as calibrator_lib
from ai_edge_quantizer_tpu.recipe import recipe_manager as rm
from tests import fixtures


def _recipe(algorithm='min_max_uniform_quantize', act_bits=8):
  mgr = rm.RecipeManager()
  mgr.add_quantization_config(
      '.*', qtyping.OpName.ALL_SUPPORTED,
      qtyping.OpQuantizationConfig(
          activation_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=act_bits, symmetric=False),
          weight_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=8, symmetric=True),
          compute_precision=qtyping.ComputePrecision.INTEGER),
      algorithm_key=algorithm)
  return mgr


def _dataset(graph, n=8):
  from ai_edge_quantizer_tpu.utils import test_data as tdl
  return tdl.create_random_dataset(graph, num_samples=n)


class TestShardDataset:

  def test_round_robin_partition(self):
    data = {'main': [{'x': np.full((1,), i)} for i in range(7)]}
    shards = shard_calib.shard_dataset(data, 3)
    assert [len(s['main']) for s in shards] == [3, 2, 2]
    seen = sorted(
        int(sample['x'][0]) for s in shards for sample in s['main'])
    assert seen == list(range(7))

  def test_empty_shards_dropped(self):
    data = {'main': [{'x': np.zeros(1)}]}
    shards = shard_calib.shard_dataset(data, 4)
    assert 'main' in shards[0]
    assert all('main' not in s for s in shards[1:])

  def test_single_shard_index(self):
    data = {'main': [{'x': np.full((1,), i)} for i in range(4)]}
    shard1 = shard_calib.shard_dataset(data, 2, shard_index=1)
    assert [int(s['x'][0]) for s in shard1['main']] == [1, 3]


class TestMergeQsvShards:

  def test_minmax_union(self):
    a = {'t': {'min': np.array([-1.0]), 'max': np.array([2.0])}}
    b = {'t': {'min': np.array([-3.0]), 'max': np.array([1.0])}}
    m = shard_calib.merge_qsv_shards([a, b])
    assert m['t']['min'] == -3.0 and m['t']['max'] == 2.0

  def test_hessian_sample_weighted(self):
    h1, h2 = np.eye(2) * 2.0, np.eye(2) * 8.0
    a = {'t': {'min': np.zeros(1), 'max': np.ones(1),
               'hessian': h1, 'num_samples': 1}}
    b = {'t': {'min': np.zeros(1), 'max': np.ones(1),
               'hessian': h2, 'num_samples': 3}}
    m = shard_calib.merge_qsv_shards([a, b])
    np.testing.assert_allclose(m['t']['hessian'],
                               np.eye(2) * (2 * 0.25 + 8 * 0.75))
    assert m['t']['num_samples'] == 4

  def test_disjoint_tensors(self):
    m = shard_calib.merge_qsv_shards(
        [{'a': {'min': np.zeros(1), 'max': np.ones(1)}},
         {'b': {'min': np.zeros(1), 'max': np.ones(1)}}])
    assert set(m) == {'a', 'b'}


class TestShardedCalibration:

  def test_merged_covers_every_shard_range(self):
    graph = fixtures.two_layer_mlp()
    mgr = _recipe()
    data = _dataset(graph, n=8)
    merged = shard_calib.calibrate_sharded(graph, data, mgr, num_shards=4)
    # Each individual shard's QSV range must sit inside the merged range.
    for shard in shard_calib.shard_dataset(data, 4):
      calib = calibrator_lib.Calibrator(graph)
      calib.calibrate(shard, mgr)
      for name, qsv in calib.get_model_qsvs().items():
        assert np.all(np.asarray(merged[name]['min'])
                      <= np.asarray(qsv['min']) + 1e-6), name
        assert np.all(np.asarray(merged[name]['max'])
                      >= np.asarray(qsv['max']) - 1e-6), name

  def test_parallel_matches_serial(self):
    graph = fixtures.two_layer_mlp()
    mgr = _recipe()
    data = _dataset(graph, n=6)
    serial = shard_calib.calibrate_sharded(
        graph, data, mgr, num_shards=3, parallel=False)
    threaded = shard_calib.calibrate_sharded(
        graph, data, mgr, num_shards=3, parallel=True)
    assert set(serial) == set(threaded)
    for name in serial:
      np.testing.assert_allclose(serial[name]['min'], threaded[name]['min'])
      np.testing.assert_allclose(serial[name]['max'], threaded[name]['max'])

  def test_gptq_hessian_merge_is_exact(self):
    # Sharded GPTQ Hessians must equal the full-dataset Hessian: 2/n XᵀX
    # is a per-sample mean, so the sample-weighted shard merge is lossless
    # when every sample appears exactly once across shards.
    graph = fixtures.two_layer_mlp()
    mgr = _recipe(algorithm='GPTQ')
    data = _dataset(graph, n=6)
    merged = shard_calib.calibrate_sharded(graph, data, mgr, num_shards=3)
    full = calibrator_lib.Calibrator(graph)
    full.calibrate(data, mgr)
    full_qsvs = full.get_model_qsvs()
    checked = 0
    for name, qsv in full_qsvs.items():
      if isinstance(qsv, dict) and 'hessian' in qsv:
        np.testing.assert_allclose(
            merged[name]['hessian'], qsv['hessian'], rtol=1e-4, atol=1e-6)
        checked += 1
    assert checked >= 1

  def test_multihost_single_process_fallback(self):
    graph = fixtures.two_layer_mlp()
    mgr = _recipe()
    data = _dataset(graph, n=4)
    merged = shard_calib.calibrate_multihost(graph, data, mgr)
    assert merged  # falls back to a local single-shard calibration
