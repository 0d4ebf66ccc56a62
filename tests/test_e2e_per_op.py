"""Per-op end-to-end SRQ tests: single-op fixture models through the full
calibrate -> quantize -> validate pipeline (reference tier 3,
tests/end_to_end_tests/*)."""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.utils import test_data as tdl
from ai_edge_quantizer_tpu.utils.test_utils import BaseOpTestCase

RNG = np.random.default_rng(0)


def _binary_graph(op):
  b = GraphBuilder('main')
  x1 = b.input('x1', (8, 256))
  x2 = b.input('x2', (8, 256))
  y = b.binary(op, x1, x2, name='y')
  b.output(y)
  return b.finalize()


def _unary_graph(op, shape=(8, 256), attrs=None):
  b = GraphBuilder('main')
  x = b.input('x', shape)
  y = b.unary(op, x, name='y', attrs=attrs)
  b.output(y)
  return b.finalize()


def _comparison_graph(op):
  """EQUAL/NOT_EQUAL: bool output is never quantized; inputs are
  quantized then compared int-side (reference
  tests/end_to_end_tests/{equal,not_equal}_test.py). A trailing ADD off
  one input keeps a quantizable tensor in the graph so SRQ has work."""
  b = GraphBuilder('main')
  x1 = b.input('x1', (8, 256))
  x2 = b.input('x2', (8, 256))
  cmp = b.op(op, [x1, x2], [(8, 256)], output_names=['cmp'],
             output_dtypes=['bool'])
  y = b.binary('ADD', x1, x2, name='y')
  b.output(cmp)
  b.output(y)
  return b.finalize()


def _graph_builders():
  def concat():
    b = GraphBuilder('main')
    x1, x2 = b.input('x1', (8, 128)), b.input('x2', (8, 128))
    y = b.op('CONCATENATION', [x1, x2], [(8, 256)], output_names=['y'],
             attrs={'axis': -1})
    b.output(y)
    return b.finalize()

  def reshape():
    b = GraphBuilder('main')
    x = b.input('x', (8, 8, 16))
    y = b.op('RESHAPE', [x], [(8, 128)], output_names=['y'],
             attrs={'new_shape': [8, 128]})
    b.output(y)
    return b.finalize()

  def transpose():
    b = GraphBuilder('main')
    x = b.input('x', (8, 8, 16))
    y = b.op('TRANSPOSE', [x], [(16, 8, 8)], output_names=['y'],
             attrs={'perm': [2, 1, 0]})
    b.output(y)
    return b.finalize()

  def avg_pool():
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.op('AVERAGE_POOL_2D', [x], [(1, 4, 4, 4)], output_names=['y'],
             attrs={'filter_size': 2, 'stride': 2, 'padding': 'VALID'})
    b.output(y)
    return b.finalize()

  def max_pool():
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.op('MAX_POOL_2D', [x], [(1, 4, 4, 4)], output_names=['y'],
             attrs={'filter_size': 2, 'stride': 2, 'padding': 'VALID'})
    b.output(y)
    return b.finalize()

  def mean():
    b = GraphBuilder('main')
    x = b.input('x', (8, 16, 16))
    y = b.op('MEAN', [x], [(8, 16)], output_names=['y'],
             attrs={'axis': [1], 'keep_dims': False})
    b.output(y)
    return b.finalize()

  def slice_op():
    b = GraphBuilder('main')
    x = b.input('x', (8, 256))
    y = b.op('SLICE', [x], [(8, 128)], output_names=['y'],
             attrs={'begin': [0, 64]})
    b.output(y)
    return b.finalize()

  def strided_slice():
    b = GraphBuilder('main')
    x = b.input('x', (8, 256))
    y = b.op('STRIDED_SLICE', [x], [(8, 128)], output_names=['y'],
             attrs={'begin': [0, 0], 'end': [8, 256], 'strides': [1, 2]})
    b.output(y)
    return b.finalize()

  def pad():
    b = GraphBuilder('main')
    x = b.input('x', (8, 252))
    y = b.op('PAD', [x], [(8, 256)], output_names=['y'],
             attrs={'paddings': [[0, 0], [2, 2]]})
    b.output(y)
    return b.finalize()

  def gather():
    b = GraphBuilder('main')
    x = b.input('x', (32, 64))
    idx = b.constant('idx', np.array([0, 3, 5, 7], np.int32))
    y = b.op('GATHER', [x, idx], [(4, 64)], output_names=['y'],
             attrs={'axis': 0})
    b.output(y)
    return b.finalize()

  def split():
    b = GraphBuilder('main')
    x = b.input('x', (8, 256))
    axis = b.constant('axis', np.array(1, np.int32))
    s0, s1 = b.op('SPLIT', [axis, x], [(8, 128), (8, 128)],
                  output_names=['s0', 's1'], attrs={'num_splits': 2})
    b.output(s0)
    b.output(s1)
    return b.finalize()

  def batch_matmul():
    b = GraphBuilder('main')
    x = b.input('x', (2, 32, 64))
    w = b.constant('w', (RNG.normal(size=(64, 32)) * 0.2).astype(np.float32))
    y = b.op('BATCH_MATMUL', [x, w], [(2, 32, 32)], output_names=['y'])
    b.output(y)
    return b.finalize()

  def embedding():
    b = GraphBuilder('main')
    ids = b.input('ids', (4, 8), 'int32')
    y = b.embedding_lookup(
        ids, (RNG.normal(size=(16, 64)) * 0.3).astype(np.float32))
    b.output(y)
    return b.finalize()

  def depthwise_conv():
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.depthwise_conv2d(
        x, (RNG.normal(size=(1, 3, 3, 4)) * 0.3).astype(np.float32),
        (RNG.normal(size=4) * 0.1).astype(np.float32))
    b.output(y)
    return b.finalize()

  def conv():
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.conv2d(
        x, (RNG.normal(size=(8, 3, 3, 4)) * 0.3).astype(np.float32),
        (RNG.normal(size=8) * 0.1).astype(np.float32))
    b.output(y)
    return b.finalize()

  def select_v2():
    b = GraphBuilder('main')
    c = b.input('c', (8, 256), 'bool')
    x1, x2 = b.input('x1', (8, 256)), b.input('x2', (8, 256))
    y = b.op('SELECT_V2', [c, x1, x2], [(8, 256)], output_names=['y'])
    b.output(y)
    return b.finalize()

  def select():
    b = GraphBuilder('main')
    c = b.input('c', (8, 256), 'bool')
    x1, x2 = b.input('x1', (8, 256)), b.input('x2', (8, 256))
    y = b.op('SELECT', [c, x1, x2], [(8, 256)], output_names=['y'])
    b.output(y)
    return b.finalize()

  def resize(op):
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.op(op, [x], [(1, 16, 16, 4)], output_names=['y'])
    b.output(y)
    return b.finalize()

  def space_to_depth():
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.op('SPACE_TO_DEPTH', [x], [(1, 4, 4, 16)], output_names=['y'],
             attrs={'block_size': 2})
    b.output(y)
    return b.finalize()

  def mirror_pad():
    b = GraphBuilder('main')
    x = b.input('x', (8, 250))
    y = b.op('MIRROR_PAD', [x], [(8, 256)], output_names=['y'],
             attrs={'paddings': [[0, 0], [3, 3]], 'mode': 'REFLECT'})
    b.output(y)
    return b.finalize()

  def padv2():
    b = GraphBuilder('main')
    x = b.input('x', (8, 252))
    y = b.op('PADV2', [x], [(8, 256)], output_names=['y'],
             attrs={'paddings': [[0, 0], [2, 2]], 'constant': 0.5})
    b.output(y)
    return b.finalize()

  def reduce(op):
    b = GraphBuilder('main')
    x = b.input('x', (8, 16, 16))
    y = b.op(op, [x], [(8, 16)], output_names=['y'],
             attrs={'axis': [1], 'keep_dims': False})
    b.output(y)
    return b.finalize()

  def pack():
    b = GraphBuilder('main')
    x1, x2 = b.input('x1', (8, 128)), b.input('x2', (8, 128))
    y = b.op('PACK', [x1, x2], [(2, 8, 128)], output_names=['y'],
             attrs={'axis': 0})
    b.output(y)
    return b.finalize()

  def unpack():
    b = GraphBuilder('main')
    x = b.input('x', (4, 8, 64))
    outs = b.op('UNPACK', [x], [(8, 64)] * 4,
                output_names=[f'y{i}' for i in range(4)],
                attrs={'axis': 0})
    for o in outs:
      b.output(o)
    return b.finalize()

  def gather_nd():
    b = GraphBuilder('main')
    x = b.input('x', (16, 64))
    idx = b.constant('idx', np.array([[0], [3], [5], [7]], np.int32))
    y = b.op('GATHER_ND', [x, idx], [(4, 64)], output_names=['y'])
    b.output(y)
    return b.finalize()

  def broadcast_to():
    b = GraphBuilder('main')
    x = b.input('x', (8, 1, 64))
    y = b.op('BROADCAST_TO', [x], [(8, 4, 64)], output_names=['y'])
    b.output(y)
    return b.finalize()

  def dynamic_update_slice():
    b = GraphBuilder('main')
    x = b.input('x', (8, 256))
    upd = b.input('upd', (8, 64))
    start = b.constant('start', np.array([0, 64], np.int32))
    y = b.op('DYNAMIC_UPDATE_SLICE', [x, upd, start], [(8, 256)],
             output_names=['y'])
    b.output(y)
    return b.finalize()

  def div():
    # Denominator kept away from zero: x1 / (x2^2 + 1).
    b = GraphBuilder('main')
    x1, x2 = b.input('x1', (8, 256)), b.input('x2', (8, 256))
    sq = b.binary('MUL', x2, x2, name='sq')
    one = b.constant('one', np.array([1.0], np.float32))
    den = b.binary('ADD', sq, one, name='den')
    y = b.binary('DIV', x1, den, name='y')
    b.output(y)
    return b.finalize()

  def sqrt_chain(op):
    # Positive domain: op(x^2 + 1).
    def build():
      b = GraphBuilder('main')
      x = b.input('x', (8, 256))
      sq = b.binary('MUL', x, x, name='sq')
      one = b.constant('one', np.array([1.0], np.float32))
      z = b.binary('ADD', sq, one, name='z')
      y = b.unary(op, z, name='y')
      b.output(y)
      return b.finalize()
    return build

  return {
      'ADD': lambda: _binary_graph('ADD'),
      'SUB': lambda: _binary_graph('SUB'),
      'MUL': lambda: _binary_graph('MUL'),
      'MAXIMUM': lambda: _binary_graph('MAXIMUM'),
      'SQUARED_DIFFERENCE': lambda: _binary_graph('SQUARED_DIFFERENCE'),
      'SOFTMAX': lambda: _unary_graph('SOFTMAX'),
      'TANH': lambda: _unary_graph('TANH'),
      'LOGISTIC': lambda: _unary_graph('LOGISTIC'),
      'GELU': lambda: _unary_graph('GELU'),
      'RELU': lambda: _unary_graph('RELU'),
      'HARD_SWISH': lambda: _unary_graph('HARD_SWISH'),
      'CONCATENATION': concat,
      'RESHAPE': reshape,
      'TRANSPOSE': transpose,
      'AVERAGE_POOL_2D': avg_pool,
      'MAX_POOL_2D': max_pool,
      'MEAN': mean,
      'SLICE': slice_op,
      'STRIDED_SLICE': strided_slice,
      'PAD': pad,
      'GATHER': gather,
      'SPLIT': split,
      'BATCH_MATMUL': batch_matmul,
      'EMBEDDING_LOOKUP': embedding,
      'DEPTHWISE_CONV_2D': depthwise_conv,
      'CONV_2D': conv,
      'SELECT_V2': select_v2,
      'SELECT': select,
      'RESIZE_BILINEAR': lambda: resize('RESIZE_BILINEAR'),
      'RESIZE_NEAREST_NEIGHBOR': lambda: resize('RESIZE_NEAREST_NEIGHBOR'),
      'SPACE_TO_DEPTH': space_to_depth,
      'MIRROR_PAD': mirror_pad,
      'PADV2': padv2,
      'SUM': lambda: reduce('SUM'),
      'REDUCE_MIN': lambda: reduce('REDUCE_MIN'),
      'PACK': pack,
      'UNPACK': unpack,
      'GATHER_ND': gather_nd,
      'BROADCAST_TO': broadcast_to,
      'DYNAMIC_UPDATE_SLICE': dynamic_update_slice,
      'DIV': div,
      'RSQRT': sqrt_chain('RSQRT'),
      'SQRT': sqrt_chain('SQRT'),
      'EQUAL': lambda: _comparison_graph('EQUAL'),
      'NOT_EQUAL': lambda: _comparison_graph('NOT_EQUAL'),
  }


_BUILDERS = _graph_builders()

# Ops whose a8w8 SRQ output error tolerance is looser (nonlinear ranges /
# fixed output scales amplifying error).
_LOOSE = {'SQUARED_DIFFERENCE': 5e-2, 'MAX_POOL_2D': 2e-3, 'GELU': 5e-3, 'BATCH_MATMUL': 5e-3,
          'CONV_2D': 5e-3, 'DEPTHWISE_CONV_2D': 5e-3, 'MAXIMUM': 5e-3,
          'MUL': 5e-3, 'SUM': 5e-2, 'DIV': 2e-2, 'RSQRT': 1e-2,
          'SQRT': 1e-2}


class TestPerOpStaticRange(BaseOpTestCase):

  @pytest.mark.parametrize(
      'op_name',
      sorted(set(_BUILDERS) - {'EMBEDDING_LOOKUP'}))  # not an SRQ op
  def test_a8w8(self, op_name):
    g = _BUILDERS[op_name]()
    qt, cmp_res = self.quantize_and_validate(g, 'default_a8w8')
    sig = cmp_res.available_signature_keys()[0]
    res = cmp_res.get_signature_comparison_result(sig)
    tol = _LOOSE.get(op_name, 1e-3)
    for name, err in {**res.output_tensors,
                      **res.intermediate_tensors}.items():
      assert err < tol, (op_name, name, err)


class TestPerOpWeightOnly(BaseOpTestCase):

  @pytest.mark.parametrize('op_name', [
      'BATCH_MATMUL', 'EMBEDDING_LOOKUP', 'CONV_2D', 'DEPTHWISE_CONV_2D'])
  def test_int8_weight_only(self, op_name):
    g = _BUILDERS[op_name]()
    self.assert_quantization_accuracy_and_size(
        g, 'default_af32w8float', min_size_reduction=0.5,
        weight_tolerance=1e-2, output_tolerance=1e-2)


class TestConv2dTranspose(BaseOpTestCase):

  def _graph(self):
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    # Operand order: [output_shape, weight, input, bias].
    w = b.constant('tconv/w',
                   (RNG.normal(size=(8, 3, 3, 4)) * 0.2).astype(np.float32))
    shape_t = b.constant('tconv/shape', np.array([1, 16, 16, 8], np.int32))
    bias = b.constant('tconv/b',
                      (RNG.normal(size=8) * 0.1).astype(np.float32))
    y = b.op('CONV_2D_TRANSPOSE', [shape_t, w, x, bias], [(1, 16, 16, 8)],
             output_names=['tconv/out'],
             attrs={'stride': 2, 'padding': 'SAME'})
    b.output(y)
    return b.finalize()

  def test_weight_only_int8(self):
    g = self._graph()
    qt, cmp_res = self.quantize_and_validate(g, 'default_af32w8float')
    sg = qt._result.quantized_model.main_subgraph()
    assert sg.tensor_by_name('tconv/w').dtype == 'int8'
    sig = cmp_res.available_signature_keys()[0]
    res = cmp_res.get_signature_comparison_result(sig)
    assert res.constant_tensors['tconv/w'] < 1e-2

  def test_srq_a8w8(self):
    g = self._graph()
    qt, cmp_res = self.quantize_and_validate(g, 'default_a8w8')
    sg = qt._result.quantized_model.main_subgraph()
    assert sg.tensor_by_name('tconv/w').dtype == 'int8'
    assert sg.tensor_by_name('tconv/b').dtype == 'int32'
    res = cmp_res.get_signature_comparison_result(
        cmp_res.available_signature_keys()[0])
    for name, err in res.output_tensors.items():
      assert err < 1e-2, (name, err)


class TestPerOpA16W8(BaseOpTestCase):
  """int16-activation tier: symmetric acts, int64 bias, SAME_AS_INPUT SUM."""

  @pytest.mark.parametrize('op_name', [
      'ADD', 'MUL', 'SOFTMAX', 'TANH', 'RESHAPE', 'CONCATENATION',
      'CONV_2D', 'AVERAGE_POOL_2D'])
  def test_a16w8(self, op_name):
    g = _BUILDERS[op_name]()
    qt, cmp_res = self.quantize_and_validate(g, 'default_a16w8')
    sig = cmp_res.available_signature_keys()[0]
    res = cmp_res.get_signature_comparison_result(sig)
    # int16 activations: an order tighter than the int8 tier for
    # weightless ops; weight-bearing ops stay floored by int8 weight error.
    tol = 5e-3 if op_name in ('CONV_2D',) else 1e-4
    for name, err in res.output_tensors.items():
      assert err < tol, (op_name, name, err)
