"""JAX-function importer tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph import jax_import

RNG = np.random.default_rng(0)

PARAMS = {
    'dense1': {'w': (RNG.normal(size=(64, 128)) * 0.2).astype(np.float32),
               'b': (RNG.normal(size=128) * 0.1).astype(np.float32)},
    'dense2': {'w': (RNG.normal(size=(128, 16)) * 0.2).astype(np.float32)},
}


def mlp(p, inputs):
  x = inputs['x']
  h = jnp.tanh(x @ p['dense1']['w'] + p['dense1']['b'])
  return {'y': h @ p['dense2']['w']}


def test_trace_structure_and_exactness():
  x = RNG.normal(size=(4, 64)).astype(np.float32)
  g = jax_import.trace_to_graph(mlp, PARAMS, {'x': x})
  ops = [op.opcode for op in g.main_subgraph().ops]
  assert ops.count('FULLY_CONNECTED') == 2
  out = GraphExecutor(g).signature_runner()({'x': x})
  ref = np.asarray(mlp(PARAMS, {'x': x})['y'])
  np.testing.assert_allclose(
      np.asarray(list(out.values())[0]), ref, atol=1e-6)


def test_quantize_traced_model():
  x = RNG.normal(size=(4, 64)).astype(np.float32)
  g = jax_import.trace_to_graph(mlp, PARAMS, {'x': x})
  qt = Quantizer(g, 'dynamic_wi8_afp32')
  res = qt.quantize()
  int8 = [t.name for t in res.quantized_model.main_subgraph().tensors
          if t.dtype == 'int8']
  assert len(int8) == 2  # both matmul weights
  r = qt.validate(num_samples=2).get_signature_comparison_result()
  assert all(v < 1e-2 for v in r.output_tensors.values())


def test_scope_regex_selects_layers():
  x = RNG.normal(size=(4, 64)).astype(np.float32)
  g = jax_import.trace_to_graph(mlp, PARAMS, {'x': x})
  qt = Quantizer(g)
  qt.add_dynamic_config('dense1.*', 'FULLY_CONNECTED', 4)
  res = qt.quantize()
  sg = res.quantized_model.main_subgraph()
  dtypes = {t.name: t.dtype for t in sg.tensors if t.buffer >= 0}
  assert dtypes['dense1/w/w'] == 'int4'
  assert dtypes['dense2/w/w'] == 'float32'


def test_flax_module_import():
  import jax
  flax = pytest.importorskip('flax')
  import flax.linen as nn

  class Mlp(nn.Module):

    @nn.compact
    def __call__(self, x):
      x = nn.Dense(64)(x)
      x = nn.tanh(x)
      return nn.Dense(8)(x)

  m = Mlp()
  x = RNG.standard_normal((2, 32)).astype(np.float32)
  variables = m.init(jax.random.PRNGKey(0), x)
  g = jax_import.trace_flax_module(m, variables, {'x': x})
  out = GraphExecutor(g).signature_runner()({'x': x})
  ref = np.asarray(m.apply(variables, x))
  np.testing.assert_allclose(np.asarray(list(out.values())[0]), ref,
                             atol=1e-6)
  qt = Quantizer(g, 'dynamic_wi8_afp32')
  res = qt.quantize()
  int8 = [t.name for t in res.quantized_model.main_subgraph().tensors
          if t.dtype == 'int8']
  assert len(int8) == 2


def test_flax_conv_import():
  import jax
  flax = pytest.importorskip('flax')
  import flax.linen as nn

  class Cnn(nn.Module):

    @nn.compact
    def __call__(self, x):
      x = nn.Conv(8, (3, 3), padding='SAME')(x)
      return nn.relu(x)

  m = Cnn()
  x = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
  variables = m.init(jax.random.PRNGKey(0), x)
  g = jax_import.trace_flax_module(m, variables, {'x': x})
  assert any(op.opcode == 'CONV_2D' for op in g.main_subgraph().ops)
  out = GraphExecutor(g).signature_runner()({'x': x})
  ref = np.asarray(m.apply(variables, x))
  np.testing.assert_allclose(np.asarray(list(out.values())[0]), ref,
                             atol=1e-5)


class TestConvBreadth:

  def test_depthwise_conv_import(self):
    import flax.linen as fnn

    class DW(fnn.Module):

      @fnn.compact
      def __call__(self, x):
        return fnn.Conv(features=4, kernel_size=(3, 3),
                        feature_group_count=4, padding='SAME')(x)

    m = DW()
    x = np.random.default_rng(0).standard_normal((1, 8, 8, 4)).astype(
        np.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    g = jax_import.trace_flax_module(m, variables, {'x': x})
    opcodes = [op.opcode for op in g.main_subgraph().ops]
    assert 'DEPTHWISE_CONV_2D' in opcodes, opcodes
    sig = g.signatures[0]
    out = GraphExecutor(g).signature_runner(sig.signature_key)({'x': x})
    ref = np.asarray(m.apply(variables, x))
    np.testing.assert_allclose(
        np.asarray(list(out.values())[0]), ref, rtol=1e-4, atol=1e-5)

  def test_asymmetric_padding_conv_import(self):
    import flax.linen as fnn

    class C(fnn.Module):

      @fnn.compact
      def __call__(self, x):
        return fnn.Conv(features=3, kernel_size=(2, 2), strides=(2, 2),
                        padding=((0, 1), (1, 0)))(x)

    m = C()
    x = np.random.default_rng(1).standard_normal((1, 9, 9, 2)).astype(
        np.float32)
    variables = m.init(jax.random.PRNGKey(1), x)
    g = jax_import.trace_flax_module(m, variables, {'x': x})
    opcodes = [op.opcode for op in g.main_subgraph().ops]
    assert 'PAD' in opcodes and 'CONV_2D' in opcodes, opcodes
    sig = g.signatures[0]
    out = GraphExecutor(g).signature_runner(sig.signature_key)({'x': x})
    ref = np.asarray(m.apply(variables, x))
    np.testing.assert_allclose(
        np.asarray(list(out.values())[0]), ref, rtol=1e-4, atol=1e-5)
