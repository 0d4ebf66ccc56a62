"""Integer SRQ execution paths: int8 x int8 MXU matmul/conv vs the
dequantize-first generic path (numerical equivalence + engagement)."""

import numpy as np
import pytest

import fixtures
from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.utils import test_data as test_data_lib

RNG = np.random.default_rng(0)


def _conv_graph():
  b = GraphBuilder('main')
  x = b.input('x', (2, 8, 8, 4))
  w = (RNG.normal(size=(8, 3, 3, 4)) * 0.2).astype(np.float32)
  bias = (RNG.normal(size=8) * 0.1).astype(np.float32)
  h = b.conv2d(x, w, bias, stride=2, padding='SAME', name='conv',
               activation='RELU6')
  wd = (RNG.normal(size=(1, 3, 3, 8)) * 0.2).astype(np.float32)
  bd = (RNG.normal(size=8) * 0.1).astype(np.float32)
  h = b.depthwise_conv2d(h, wd, bd, stride=1, padding='SAME', name='dw')
  y = b.fully_connected(
      h if isinstance(h, int) else h,
      (RNG.normal(size=(4, 8)) * 0.2).astype(np.float32),
      None, name='fc')
  b.output(y)
  return b.finalize()


def _quantize_srq(g):
  qt = Quantizer(g, 'default_a8w8')
  cr = qt.calibrate(test_data_lib.create_random_dataset(g, num_samples=16))
  return qt.quantize(cr).quantized_model


def _run(graph, inputs, monkeypatch, srq_int):
  monkeypatch.setenv('AEQT_SRQ_INT', '1' if srq_int else '0')
  ex = GraphExecutor(graph)
  return ex.signature_runner()(inputs)


def test_integer_conv_fc_match_dequant_path(monkeypatch):
  g = _conv_graph()
  quantized = _quantize_srq(g)
  inputs = {'x': RNG.normal(size=(2, 8, 8, 4)).astype(np.float32)}
  out_int = _run(quantized, inputs, monkeypatch, srq_int=True)
  out_f32 = _run(quantized, inputs, monkeypatch, srq_int=False)
  for k in out_f32:
    a = np.asarray(out_int[k], np.float32)
    b = np.asarray(out_f32[k], np.float32)
    # Same integer grid: outputs requantize to int8, so the two paths may
    # differ by at most 1 quantization step on borderline cells.
    assert np.max(np.abs(a - b)) <= 1.0 + 1e-6, (k, np.max(np.abs(a - b)))
    assert np.mean(a != b) < 0.02, (k, np.mean(a != b))


def test_integer_fc_engages_and_matches(monkeypatch):
  g = fixtures.two_layer_mlp(in_dim=256, hidden=128, out_dim=32, batch=4)
  quantized = _quantize_srq(g)
  from ai_edge_quantizer_tpu.kernels import qmatmul as qmm
  calls = []
  orig = qmm.srq_matmul
  monkeypatch.setattr(qmm, 'srq_matmul',
                      lambda *a, **k: calls.append(1) or orig(*a, **k))
  inputs = {'x': RNG.normal(size=(4, 256)).astype(np.float32)}
  _run(quantized, inputs, monkeypatch, srq_int=True)
  assert calls, 'integer SRQ matmul path did not engage'


def test_srq_matmul_closed_form():
  """srq_matmul equals the dequantize-then-f32-matmul reference exactly
  (integer arithmetic, then one rescale)."""
  import jax.numpy as jnp
  from ai_edge_quantizer_tpu.kernels import qmatmul as qmm
  rng = np.random.default_rng(1)
  x_q = rng.integers(-128, 128, (5, 64)).astype(np.int8)
  w_q = rng.integers(-127, 128, (16, 64)).astype(np.int8)
  ws = (rng.random(16) * 0.02 + 0.01).astype(np.float32)
  xs, xzp = 0.05, 3
  bias = rng.normal(size=16).astype(np.float32)
  got = np.asarray(qmm.srq_matmul(
      jnp.asarray(x_q), xs, xzp, jnp.asarray(w_q), jnp.asarray(ws),
      bias=jnp.asarray(bias)))
  x_f = (x_q.astype(np.float64) - xzp) * xs
  w_f = w_q.astype(np.float64) * ws[:, None]
  want = x_f @ w_f.T + bias
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_integer_bmm_matches_dequant_path(monkeypatch):
  """SRQ BATCH_MATMUL (attention score/context matmuls) via int8 MXU with
  closed-form zero-point expansion matches the dequantize-first path."""
  b = GraphBuilder('main')
  p = b.input('p', (2, 4, 8, 32))
  q = b.input('q', (2, 4, 32, 8))
  z = b.op('BATCH_MATMUL', [p, q], [(2, 4, 8, 8)], output_names=['z'])
  y = b.unary('SOFTMAX', z, name='probs')
  b.output(y)
  g = b.finalize()
  quantized = _quantize_srq(g)
  inputs = {
      'p': RNG.normal(size=(2, 4, 8, 32)).astype(np.float32),
      'q': RNG.normal(size=(2, 4, 32, 8)).astype(np.float32),
  }
  out_int = _run(quantized, inputs, monkeypatch, srq_int=True)
  out_f32 = _run(quantized, inputs, monkeypatch, srq_int=False)
  for k in out_f32:
    a = np.asarray(out_int[k], np.float32)
    c = np.asarray(out_f32[k], np.float32)
    assert np.max(np.abs(a - c)) <= 1.0 + 1e-6, (k, np.max(np.abs(a - c)))


def test_integer_bmm_adjoint_flags(monkeypatch):
  """adj_x/adj_y transposes happen BEFORE the integer contraction."""
  b = GraphBuilder('main')
  p = b.input('p', (2, 32, 8))
  q = b.input('q', (2, 32, 8))
  z = b.op('BATCH_MATMUL', [p, q], [(2, 8, 8)], output_names=['z'],
           attrs={'adj_x': True})
  b.output(z)
  g = b.finalize()
  quantized = _quantize_srq(g)
  inputs = {
      'p': RNG.normal(size=(2, 32, 8)).astype(np.float32),
      'q': RNG.normal(size=(2, 32, 8)).astype(np.float32),
  }
  out_int = _run(quantized, inputs, monkeypatch, srq_int=True)
  out_f32 = _run(quantized, inputs, monkeypatch, srq_int=False)
  a = np.asarray(out_int['z'], np.float32)
  c = np.asarray(out_f32['z'], np.float32)
  assert np.max(np.abs(a - c)) <= 1.0 + 1e-6
