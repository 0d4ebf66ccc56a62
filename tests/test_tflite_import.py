"""TFLite importer tests (migration path from the reference toolchain)."""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from ai_edge_quantizer_tpu import Quantizer  # noqa: E402
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor  # noqa
from ai_edge_quantizer_tpu.graph import tflite_import  # noqa: E402


@pytest.fixture(scope='module')
def mlp_tflite(tmp_path_factory):
  rng = np.random.default_rng(0)

  class M(tf.Module):

    def __init__(self):
      self.w1 = tf.constant(rng.normal(size=(16, 32)).astype(np.float32) * .3)
      self.b1 = tf.constant(rng.normal(size=(32,)).astype(np.float32) * .1)
      self.w2 = tf.constant(rng.normal(size=(32, 8)).astype(np.float32) * .3)

    @tf.function(input_signature=[tf.TensorSpec((1, 16), tf.float32)])
    def __call__(self, x):
      h = tf.nn.relu(tf.matmul(x, self.w1) + self.b1)
      return tf.matmul(h, self.w2)

  m = M()
  conv = tf.lite.TFLiteConverter.from_concrete_functions(
      [m.__call__.get_concrete_function()], m)
  path = tmp_path_factory.mktemp('tfl') / 'mlp.tflite'
  path.write_bytes(conv.convert())
  return m, str(path)


class TestTfliteImport:

  def test_structure(self, mlp_tflite):
    _, path = mlp_tflite
    g = tflite_import.load_tflite(path)
    sg = g.main_subgraph()
    assert [op.opcode for op in sg.ops] == ['FULLY_CONNECTED',
                                            'FULLY_CONNECTED']
    assert sg.ops[0].attrs['fused_activation'] == 'RELU'
    assert g.signatures[0].signature_key == 'serving_default'

  def test_execution_matches_tf(self, mlp_tflite):
    m, path = mlp_tflite
    g = tflite_import.load_tflite(path)
    x = np.random.default_rng(1).normal(size=(1, 16)).astype(np.float32)
    sig = g.signatures[0]
    out = GraphExecutor(g).signature_runner(sig.signature_key)(
        {list(sig.inputs)[0]: x})
    y_tf = m(tf.constant(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(list(out.values())[0]), y_tf, atol=1e-5)

  def test_quantize_imported_model(self, mlp_tflite):
    _, path = mlp_tflite
    qt = Quantizer(path, 'dynamic_wi8_afp32')  # path directly
    res = qt.quantize()
    dtypes = {t.dtype for sg in res.quantized_model.subgraphs
              for t in sg.tensors if t.buffer >= 0 and t.shape
              and len(t.shape) == 2}
    assert 'int8' in dtypes
    r = qt.validate(num_samples=2).get_signature_comparison_result(
        'serving_default')
    assert all(v < 1e-2 for v in r.output_tensors.values())


def test_conv_model_import_and_static_quant(tmp_path):
  rng = np.random.default_rng(0)

  class Cnn(tf.Module):

    def __init__(self):
      self.k1 = tf.constant(
          (rng.standard_normal((3, 3, 1, 8)) * 0.3).astype(np.float32))
      self.b1 = tf.constant(
          (rng.standard_normal(8) * 0.1).astype(np.float32))
      self.w = tf.constant(
          (rng.standard_normal((14 * 14 * 8, 10)) * 0.05).astype(np.float32))

    @tf.function(input_signature=[tf.TensorSpec((1, 28, 28, 1), tf.float32)])
    def __call__(self, x):
      h = tf.nn.relu(
          tf.nn.conv2d(x, self.k1, strides=2, padding='SAME') + self.b1)
      h = tf.reshape(h, (1, -1))
      return tf.nn.softmax(tf.matmul(h, self.w))

  m = Cnn()
  conv = tf.lite.TFLiteConverter.from_concrete_functions(
      [m.__call__.get_concrete_function()], m)
  path = tmp_path / 'cnn.tflite'
  path.write_bytes(conv.convert())

  from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
  from ai_edge_quantizer_tpu.graph import tflite_import
  from ai_edge_quantizer_tpu.utils import test_data as tdl

  g = tflite_import.load_tflite(str(path))
  assert [op.opcode for op in g.main_subgraph().ops] == [
      'CONV_2D', 'RESHAPE', 'FULLY_CONNECTED', 'SOFTMAX']
  x = np.random.default_rng(1).standard_normal((1, 28, 28, 1)).astype(
      np.float32)
  sig = g.signatures[0]
  out = GraphExecutor(g).signature_runner(sig.signature_key)(
      {list(sig.inputs)[0]: x})
  ref = m(tf.constant(x)).numpy()
  np.testing.assert_allclose(np.asarray(list(out.values())[0]), ref,
                             atol=1e-5)
  qt = Quantizer(g, 'default_a8w8')
  cr = qt.calibrate(tdl.create_random_dataset(g, num_samples=8))
  res = qt.quantize(cr)
  assert all(t.dtype.startswith('int')
             for t in res.quantized_model.main_subgraph().tensors)


def test_while_control_flow_subgraphs(tmp_path):
  """WHILE cond/body subgraph indices import as side_effect_subgraphs."""

  class Loop(tf.Module):

    @tf.function(input_signature=[tf.TensorSpec((1, 8), tf.float32)])
    def __call__(self, x):
      i0 = tf.constant(0)
      cond = lambda i, v: i < 3
      body = lambda i, v: (i + 1, v * 1.5)
      _, out = tf.while_loop(cond, body, (i0, x))
      return out

  m = Loop()
  conv = tf.lite.TFLiteConverter.from_concrete_functions(
      [m.__call__.get_concrete_function()], m)
  path = tmp_path / 'loop.tflite'
  path.write_bytes(conv.convert())
  g = tflite_import.load_tflite(str(path))
  while_ops = [op for sg in g.subgraphs for op in sg.ops
               if op.opcode == 'WHILE']
  assert while_ops, [op.opcode for sg in g.subgraphs for op in sg.ops]
  assert len(while_ops[0].side_effect_subgraphs) == 2
  cond_idx, body_idx = while_ops[0].side_effect_subgraphs
  assert 0 < cond_idx < len(g.subgraphs)
  assert 0 < body_idx < len(g.subgraphs)
  assert cond_idx != body_idx


def test_while_loop_executes(tmp_path):
  """Imported WHILE lowers to lax.while_loop and matches TF numerics."""

  class Loop(tf.Module):

    @tf.function(input_signature=[tf.TensorSpec((1, 8), tf.float32)])
    def __call__(self, x):
      i0 = tf.constant(0)
      cond = lambda i, v: i < 3
      body = lambda i, v: (i + 1, v * 1.5 + 0.25)
      _, out = tf.while_loop(cond, body, (i0, x))
      return out

  m = Loop()
  conv = tf.lite.TFLiteConverter.from_concrete_functions(
      [m.__call__.get_concrete_function()], m)
  path = tmp_path / 'loop2.tflite'
  path.write_bytes(conv.convert())
  g = tflite_import.load_tflite(str(path))
  x = np.random.default_rng(0).standard_normal((1, 8)).astype(np.float32)
  sig = g.signatures[0]
  out = GraphExecutor(g).signature_runner(sig.signature_key)(
      {list(sig.inputs)[0]: x})
  ref = m(tf.constant(x)).numpy()
  got = next(v for v in out.values()
             if np.asarray(v).dtype == np.float32
             and np.asarray(v).shape == ref.shape)
  np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_if_control_flow(tmp_path):
  """tf.cond -> IF builtin: subgraph import + lax.cond execution."""

  class Branchy(tf.Module):

    @tf.function(input_signature=[tf.TensorSpec((1, 4), tf.float32)])
    def __call__(self, x):
      return tf.cond(tf.reduce_sum(x) > 0,
                     lambda: x * 2.0, lambda: x - 1.0)

  m = Branchy()
  conv = tf.lite.TFLiteConverter.from_concrete_functions(
      [m.__call__.get_concrete_function()], m)
  path = tmp_path / 'ifm.tflite'
  path.write_bytes(conv.convert())
  g = tflite_import.load_tflite(str(path))
  if_ops = [op for sg in g.subgraphs for op in sg.ops if op.opcode == 'IF']
  assert if_ops and len(if_ops[0].side_effect_subgraphs) == 2
  sig = g.signatures[0]
  runner = GraphExecutor(g).signature_runner(sig.signature_key)
  for sign in (1.0, -1.0):
    x = np.full((1, 4), sign, np.float32)
    out = runner({list(sig.inputs)[0]: x})
    ref = m(tf.constant(x)).numpy()
    got = next(np.asarray(v) for v in out.values()
               if np.asarray(v).shape == ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5)
