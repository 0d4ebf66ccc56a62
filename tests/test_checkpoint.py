"""Serving-weight checkpoint round-trip tests (orbax-backed)."""

import numpy as np
import pytest

import fixtures
from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph import checkpoint


def test_roundtrip(tmp_path):
  g = fixtures.two_layer_mlp()
  qt = Quantizer(g, 'dynamic_wi8_afp32')
  ex = GraphExecutor(qt.quantize().quantized_model)
  path = str(tmp_path / 'ckpt')
  checkpoint.save_serving_weights(ex._weights, path)
  restored = checkpoint.load_serving_weights(path)
  assert set(restored) == set(ex._weights)
  for k in ex._weights:
    np.testing.assert_array_equal(np.asarray(restored[k]),
                                  np.asarray(ex._weights[k]))


def test_restore_with_sharding(tmp_path):
  import jax
  from jax.sharding import NamedSharding, PartitionSpec as P
  from ai_edge_quantizer_tpu.parallel import mesh as mesh_lib
  g = fixtures.two_layer_mlp()
  qt = Quantizer(g, 'dynamic_wi8_afp32')
  ex = GraphExecutor(qt.quantize().quantized_model)
  path = str(tmp_path / 'ckpt')
  checkpoint.save_serving_weights(ex._weights, path)
  mesh = mesh_lib.make_mesh(4, dp=1)
  shardings = {k: NamedSharding(mesh, P()) for k in ex._weights}
  restored = checkpoint.load_serving_weights(path, shardings)
  some = next(iter(restored.values()))
  assert len(some.sharding.device_set) == 4
