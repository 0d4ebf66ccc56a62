"""Exhaustive op-architecture matrix: every OP_SPECS row x execution mode
x granularity x bitwidth, asserting the emitted transformations + params
per cell WITHOUT executing a model.

The parametrized analog of the reference's ~45-file
`algorithms/uniform_quantize/op_architecture_tests/` tier (harness
`op_architecture_tests/test_utils.py:37-100`): build a tiny one-op graph,
run the params generator with a single-op recipe (skip_checks=True so the
matrix covers cells beyond the default policy), and assert:

  * per-tensor transformations follow the mode tables
    (engine.select_transformations; ref common_utils.py:1068-1121),
  * SAME_AS_INPUT / SAME_AS_OUTPUT / FIXED_OUTPUT scale propagation,
  * weight params materialize at the requested bits + quantized dim,
  * the SRQ bias rule (int32 at input_scale*weight_scale; int64 for a16).
"""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.algorithms.uniform import op_library
from ai_edge_quantizer_tpu.graph import ir
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.pipeline.params_generator import ParamsGenerator
from ai_edge_quantizer_tpu.recipe import recipe_manager as rm

_QT = qtyping.QuantTransformation
_G = qtyping.QuantGranularity
_Op = qtyping.OpName
_C = op_library.engine.OpQuantConstraint

RNG = np.random.default_rng(7)


def _f32(*shape):
  return RNG.normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------------------
# One-op graph builders. Each returns (graph, float_input_names,
# const_input_names, output_names); ignored/structure operands are int32
# consts the engine must leave untouched.
# ---------------------------------------------------------------------------


def _std_graph(opcode, n_float_inputs=1, n_outputs=1, pre=(), post=(),
               shape=(1, 16)):
  """[pre consts] + n float inputs + [post consts] -> op -> outputs."""
  b = GraphBuilder('main')
  inputs = []
  float_names = []
  for i, data in enumerate(pre):
    inputs.append(b.constant(f'c{i}', data))
  for i in range(n_float_inputs):
    t = b.input(f'x{i}', shape)
    inputs.append(t)
    float_names.append(f'x{i}')
  for i, data in enumerate(post):
    inputs.append(b.constant(f'cp{i}', data))
  out_names = [f'y{i}' for i in range(n_outputs)]
  outs = b.op(opcode, inputs, [shape] * n_outputs, output_names=out_names)
  if n_outputs == 1:
    outs = [outs]
  for o in outs:
    b.output(o)
  return b.finalize(), float_names, [], out_names


def _graph_for(op: _Op):
  """A minimal valid one-op graph for each OP_SPECS row."""
  axes = np.array([1], np.int32)
  if op == _Op.FULLY_CONNECTED:
    b = GraphBuilder('main')
    x = b.input('x', (1, 16))
    y = b.fully_connected(x, _f32(8, 16), _f32(8), name='fc')
    b.output(y)
    return b.finalize(), ['x'], ['fc/w', 'fc/b'], ['fc/out']
  if op == _Op.CONV_2D:
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.conv2d(x, _f32(6, 3, 3, 4), _f32(6), name='conv')
    b.output(y)
    return b.finalize(), ['x'], ['conv/w', 'conv/b'], ['conv/out']
  if op == _Op.DEPTHWISE_CONV_2D:
    b = GraphBuilder('main')
    x = b.input('x', (1, 8, 8, 4))
    y = b.depthwise_conv2d(x, _f32(1, 3, 3, 4), _f32(4), name='dw')
    b.output(y)
    return b.finalize(), ['x'], ['dw/w', 'dw/b'], ['dw/out']
  if op == _Op.CONV_2D_TRANSPOSE:
    # Operand order [output_shape, weight, input, bias]
    # (ref common_quantize.py:588-645).
    b = GraphBuilder('main')
    oshape = b.constant('oshape', np.array([1, 8, 8, 6], np.int32))
    w = b.constant('w', _f32(6, 3, 3, 4))
    x = b.input('x', (1, 8, 8, 4))
    bias = b.constant('b', _f32(6))
    y = b.op('CONV_2D_TRANSPOSE', [oshape, w, x, bias], [(1, 8, 8, 6)],
             output_names=['y'])
    b.output(y)
    return b.finalize(), ['x'], ['w', 'b'], ['y']
  if op == _Op.BATCH_MATMUL:
    return _std_graph('BATCH_MATMUL', n_float_inputs=2, shape=(1, 16, 16))
  if op == _Op.EMBEDDING_LOOKUP:
    b = GraphBuilder('main')
    ids = b.input('ids', (1, 4), dtype='int32')
    table = b.constant('table', _f32(32, 16))
    y = b.op('EMBEDDING_LOOKUP', [ids, table], [(1, 4, 16)],
             output_names=['y'])
    b.output(y)
    return b.finalize(), [], ['table'], ['y']
  if op in (_Op.RESHAPE, _Op.TRANSPOSE, _Op.PAD, _Op.MIRROR_PAD,
            _Op.BROADCAST_TO, _Op.RESIZE_BILINEAR,
            _Op.RESIZE_NEAREST_NEIGHBOR):
    return _std_graph(op.value, post=(axes,))
  if op == _Op.PADV2:
    # [x, paddings (int32, ignored), pad_value (float activation)]
    b = GraphBuilder('main')
    x = b.input('x0', (1, 16))
    pads = b.constant('pads', np.zeros((2, 2), np.int32))
    pv = b.input('x1', (1, 1))
    y = b.op('PADV2', [x, pads, pv], [(1, 16)], output_names=['y0'])
    b.output(y)
    return b.finalize(), ['x0', 'x1'], [], ['y0']
  if op in (_Op.AVERAGE_POOL_2D, _Op.MAX_POOL_2D, _Op.SPACE_TO_DEPTH,
            _Op.UNPACK, _Op.RELU, _Op.GELU, _Op.RSQRT, _Op.SQRT,
            _Op.HARD_SWISH, _Op.LOGISTIC, _Op.TANH, _Op.SOFTMAX):
    return _std_graph(op.value)
  if op in (_Op.SLICE,):
    return _std_graph('SLICE', post=(axes, axes))
  if op == _Op.STRIDED_SLICE:
    return _std_graph('STRIDED_SLICE', post=(axes, axes, axes))
  if op == _Op.SPLIT:
    return _std_graph('SPLIT', pre=(np.array([1], np.int32),), n_outputs=2)
  if op in (_Op.GATHER, _Op.GATHER_ND):
    return _std_graph(op.value, post=(np.array([[0]], np.int32),))
  if op in (_Op.SUM, _Op.MEAN, _Op.REDUCE_MIN):
    return _std_graph(op.value, post=(axes,))
  if op in (_Op.CONCATENATION, _Op.PACK, _Op.MAXIMUM, _Op.ADD, _Op.SUB,
            _Op.MUL, _Op.DIV, _Op.SQUARED_DIFFERENCE):
    return _std_graph(op.value, n_float_inputs=2)
  if op in (_Op.SELECT, _Op.SELECT_V2):
    return _std_graph(op.value, pre=(np.zeros((1, 16), np.int32),),
                      n_float_inputs=2)
  if op == _Op.DYNAMIC_UPDATE_SLICE:
    return _std_graph('DYNAMIC_UPDATE_SLICE', n_float_inputs=2,
                      post=(np.array([0, 0], np.int32),))
  if op in (_Op.EQUAL, _Op.NOT_EQUAL):
    b = GraphBuilder('main')
    a = b.input('x0', (1, 16))
    c = b.input('x1', (1, 16))
    y = b.op(op.value, [a, c], [(1, 16)], output_names=['y0'],
             output_dtypes=['bool'])
    b.output(y)
    return b.finalize(), ['x0', 'x1'], [], []  # bool output auto-ignored
  if op == _Op.RMS_NORM:
    return _std_graph('RMS_NORM', post=(np.array([1e-6], np.float32),))
  return None


# ---------------------------------------------------------------------------
# Modes under test.
# ---------------------------------------------------------------------------


def _w_cfg(bits, granularity):
  return qtyping.TensorQuantizationConfig(
      num_bits=bits, symmetric=True, granularity=granularity)


def _cfg(mode, w_bits=8, w_gran=_G.CHANNELWISE, a_bits=8):
  if mode == 'SRQ':
    return qtyping.OpQuantizationConfig(
        activation_tensor_config=qtyping.TensorQuantizationConfig(
            num_bits=a_bits, symmetric=(a_bits == 16),
            granularity=_G.TENSORWISE),
        weight_tensor_config=_w_cfg(w_bits, w_gran),
        compute_precision=qtyping.ComputePrecision.INTEGER,
        skip_checks=True)
  if mode == 'DRQ':
    return qtyping.OpQuantizationConfig(
        weight_tensor_config=_w_cfg(w_bits, w_gran),
        compute_precision=qtyping.ComputePrecision.INTEGER,
        skip_checks=True)
  assert mode == 'WEIGHT_ONLY'
  return qtyping.OpQuantizationConfig(
      weight_tensor_config=_w_cfg(w_bits, w_gran),
      compute_precision=qtyping.ComputePrecision.FLOAT,
      explicit_dequantize=True,
      skip_checks=True)


def _params_for(graph, op, config):
  mgr = rm.RecipeManager()
  mgr.add_quantization_config('.*', op, config)
  # Mock QSVs for ACTIVATIONS only: weight/const params must derive from
  # tensor content (per-channel min/max), exactly as in calibration-free
  # materialization.
  qsvs = {}
  for sg in graph.subgraphs:
    for t in sg.tensors:
      if not t.is_constant:
        qsvs[t.name] = {'min': np.array([-1.0], np.float32),
                        'max': np.array([1.0], np.float32)}
  return ParamsGenerator(graph).generate_quantization_parameters(mgr, qsvs)


def _consumers(params, name):
  return [list(c.transformations) for c in params[name].consumers or []]


def _producer(params, name):
  p = params[name].producer
  return list(p.transformations) if p else None


_WEIGHT_OPS = {_Op.FULLY_CONNECTED, _Op.CONV_2D, _Op.DEPTHWISE_CONV_2D,
               _Op.CONV_2D_TRANSPOSE, _Op.EMBEDDING_LOOKUP}

_ALL_OPS = [op for op in op_library.OP_SPECS
            if op not in (_Op.INPUT, _Op.OUTPUT, _Op.STABLEHLO_COMPOSITE)]


@pytest.mark.parametrize('mode', ['SRQ', 'DRQ', 'WEIGHT_ONLY'])
@pytest.mark.parametrize('op', _ALL_OPS, ids=lambda o: o.value)
def test_matrix_transformations(op, mode):
  """Every op x mode cell emits the mode-table transformations."""
  built = _graph_for(op)
  assert built is not None, f'no graph builder for {op}'
  graph, float_inputs, const_inputs, outputs = built
  params = _params_for(graph, op, _cfg(mode))

  for name in float_inputs:
    trans = _consumers(params, name)
    if mode == 'SRQ':
      assert [_QT.ADD_QUANTIZE] in trans, (op, mode, name, trans)
    else:
      assert all(t in ([_QT.NO_QUANTIZE],) for t in trans), (
          op, mode, name, trans)

  for name in const_inputs:
    if name.endswith('/b') or name == 'b':
      continue  # bias asserted separately (SRQ only quantizes it)
    trans = _consumers(params, name)
    if mode == 'SRQ' or mode == 'DRQ':
      assert [_QT.QUANTIZE_TENSOR] in trans, (op, mode, name, trans)
    else:
      assert [_QT.ADD_DEQUANTIZE] in trans, (op, mode, name, trans)

  for name in outputs:
    prod = _producer(params, name)
    if mode == 'SRQ':
      assert prod == [_QT.ADD_DEQUANTIZE], (op, mode, name, prod)
    else:
      assert prod in (None, [_QT.NO_QUANTIZE]), (op, mode, name, prod)


@pytest.mark.parametrize('w_bits', [4, 8])
@pytest.mark.parametrize('w_gran', [_G.TENSORWISE, _G.CHANNELWISE],
                         ids=['tensor', 'channel'])
@pytest.mark.parametrize('mode', ['SRQ', 'DRQ', 'WEIGHT_ONLY'])
@pytest.mark.parametrize('op', sorted(_WEIGHT_OPS, key=lambda o: o.value),
                         ids=lambda o: o.value)
def test_matrix_weight_params(op, mode, w_gran, w_bits):
  """Weight ops materialize the requested bits + quantized dimension."""
  graph, _, const_inputs, _ = _graph_for(op)
  params = _params_for(graph, op, _cfg(mode, w_bits=w_bits, w_gran=w_gran))
  w_name = next(n for n in const_inputs
                if n.endswith('/w') or n in ('w', 'table'))
  w = params[w_name].consumers[0].parameters
  assert w.num_bits == w_bits, (op, mode, w.num_bits)
  assert w.quantized_data is not None
  expected_dim = {
      _Op.FULLY_CONNECTED: 0,
      _Op.CONV_2D: 0,
      _Op.DEPTHWISE_CONV_2D: 3,
      _Op.CONV_2D_TRANSPOSE: 0,
      _Op.EMBEDDING_LOOKUP: 0,
  }[op]
  if w_gran == _G.CHANNELWISE:
    assert w.quantized_dimension == expected_dim, (op, w.quantized_dimension)
    sg = graph.main_subgraph()
    w_shape = sg.tensors[sg.tensor_id_by_name(w_name)].shape
    assert np.asarray(w.scale).size == w_shape[expected_dim]
  else:
    assert np.asarray(w.scale).size == 1


@pytest.mark.parametrize('a_bits', [8, 16])
@pytest.mark.parametrize(
    'op', [_Op.FULLY_CONNECTED, _Op.CONV_2D, _Op.DEPTHWISE_CONV_2D,
           _Op.CONV_2D_TRANSPOSE], ids=lambda o: o.value)
def test_matrix_srq_bias_rule(op, a_bits):
  """Bias: int32 (int64 for a16) at input_scale*weight_scale
  (ref uniform_quantize_tensor.py:412-489)."""
  graph, float_inputs, const_inputs, _ = _graph_for(op)
  params = _params_for(graph, op, _cfg('SRQ', a_bits=a_bits))
  b_name = next(n for n in const_inputs if n.endswith('/b') or n == 'b')
  w_name = next(n for n in const_inputs if n.endswith('/w') or n == 'w')
  b = params[b_name].consumers[0].parameters
  assert b.num_bits == (64 if a_bits == 16 else 32), (op, a_bits, b.num_bits)
  in_scale = params[float_inputs[0]].consumers[0].parameters.scale
  w_scale = params[w_name].consumers[0].parameters.scale
  np.testing.assert_allclose(
      np.asarray(b.scale).reshape(-1),
      (np.asarray(in_scale) * np.asarray(w_scale)).reshape(-1), rtol=1e-6)


_SAI_OPS = [op for op, spec in op_library.OP_SPECS.items()
            if spec.constraint == _C.SAME_AS_INPUT_SCALE
            and op in dict.fromkeys(_ALL_OPS)]
_SAO_OPS = [op for op, spec in op_library.OP_SPECS.items()
            if spec.constraint == _C.SAME_AS_OUTPUT_SCALE
            and op in dict.fromkeys(_ALL_OPS)]


@pytest.mark.parametrize('op', _SAI_OPS, ids=lambda o: o.value)
def test_matrix_same_as_input_scale(op):
  """SAI ops: every output's params equal the (first float) input's."""
  graph, float_inputs, _, outputs = _graph_for(op)
  params = _params_for(graph, op, _cfg('SRQ'))
  src = float_inputs[0]
  in_p = params[src].consumers[0].parameters
  for name in outputs:
    out_p = params[name].producer.parameters
    np.testing.assert_allclose(np.asarray(out_p.scale),
                               np.asarray(in_p.scale), rtol=1e-7)
    assert np.all(np.asarray(out_p.zero_point)
                  == np.asarray(in_p.zero_point))


@pytest.mark.parametrize('op', _SAO_OPS, ids=lambda o: o.value)
def test_matrix_same_as_output_scale(op):
  """SAO ops: every float input's params equal the output's."""
  graph, float_inputs, _, outputs = _graph_for(op)
  params = _params_for(graph, op, _cfg('SRQ'))
  out_p = params[outputs[0]].producer.parameters
  for name in float_inputs:
    in_p = params[name].consumers[0].parameters
    np.testing.assert_allclose(np.asarray(in_p.scale),
                               np.asarray(out_p.scale), rtol=1e-7)
    assert np.all(np.asarray(in_p.zero_point)
                  == np.asarray(out_p.zero_point))


@pytest.mark.parametrize('a_bits', [8, 16])
@pytest.mark.parametrize('op,scale8,scale16,zp8', [
    (_Op.SOFTMAX, 1.0 / 256, 1.0 / 32768, -128),
    (_Op.LOGISTIC, 1.0 / 256, 1.0 / 32768, -128),
    (_Op.TANH, 1.0 / 128, 1.0 / 32768, 0),
], ids=lambda v: str(v))
def test_matrix_fixed_output_scale(op, scale8, scale16, zp8, a_bits):
  """Fixed-output ops pin the kernel-required output range
  (ref common_quantize.py:194-230, 648-675)."""
  graph, _, _, outputs = _graph_for(op)
  params = _params_for(graph, op, _cfg('SRQ', a_bits=a_bits))
  out_p = params[outputs[0]].producer.parameters
  expected = scale16 if a_bits == 16 else scale8
  np.testing.assert_allclose(float(np.asarray(out_p.scale)), expected,
                             rtol=1e-7)
  if a_bits == 8:
    assert int(np.asarray(out_p.zero_point)) == zp8


def test_matrix_sum_bit_dependent_constraint():
  """SUM: no scale tie at 8-bit activations; SAI at 16
  (ref common_quantize.py:500-525)."""
  graph, float_inputs, _, outputs = _graph_for(_Op.SUM)
  p8 = _params_for(graph, _Op.SUM, _cfg('SRQ', a_bits=8))
  # 8-bit: output params derive from the output QSV, no forced tie
  # (both are [-1, 1] mock QSVs here, so compare zero_points asymmetric).
  assert p8[outputs[0]].producer.parameters is not None
  graph2, float_inputs2, _, outputs2 = _graph_for(_Op.SUM)
  p16 = _params_for(graph2, _Op.SUM, _cfg('SRQ', a_bits=16))
  in_p = p16[float_inputs2[0]].consumers[0].parameters
  out_p = p16[outputs2[0]].producer.parameters
  np.testing.assert_allclose(np.asarray(out_p.scale),
                             np.asarray(in_p.scale), rtol=1e-7)


def test_matrix_covers_all_spec_rows():
  """Every OP_SPECS row (minus virtual IO + composite) has a graph."""
  for op in _ALL_OPS:
    assert _graph_for(op) is not None, op
