"""Op-architecture tests: per-op materialization emits the right
transformations and params, WITHOUT executing a model.

The analog of the reference's
`algorithms/uniform_quantize/op_architecture_tests/` tier: build a tiny
graph around one op, run the params generator, and assert on the
producer/consumer transformation structure.
"""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.pipeline.params_generator import ParamsGenerator
from ai_edge_quantizer_tpu.recipe import recipe_manager as rm

_QT = qtyping.QuantTransformation
_G = qtyping.QuantGranularity


def _srq_recipe():
  mgr = rm.RecipeManager()
  mgr.add_quantization_config(
      '.*', qtyping.OpName.ALL_SUPPORTED,
      qtyping.OpQuantizationConfig(
          activation_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=8, symmetric=False, granularity=_G.TENSORWISE),
          weight_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=8, symmetric=True, granularity=_G.CHANNELWISE),
          compute_precision=qtyping.ComputePrecision.INTEGER))
  return mgr


def _drq_recipe(op='FULLY_CONNECTED', bits=8):
  mgr = rm.RecipeManager()
  mgr.add_dynamic_config('.*', qtyping.OpName(op), bits)
  return mgr


def _mock_qsvs(graph):
  """Synthetic activation min/max for every tensor."""
  qsvs = {}
  for sg in graph.subgraphs:
    for t in sg.tensors:
      qsvs[t.name] = {'min': np.array([-1.0], np.float32),
                      'max': np.array([1.0], np.float32)}
  return qsvs


def _consumer_trans(params, name):
  return [c.transformations for c in params[name].consumers or []]


def _producer_trans(params, name):
  p = params[name].producer
  return p.transformations if p else None


class TestFcModes:

  def _fc_graph(self):
    rng = np.random.default_rng(0)
    b = GraphBuilder('main')
    x = b.input('x', (1, 16))
    y = b.fully_connected(x, rng.normal(size=(8, 16)).astype(np.float32),
                          rng.normal(size=8).astype(np.float32), name='fc')
    b.output(y)
    return b.finalize()

  def test_drq_transformations(self):
    g = self._fc_graph()
    params = ParamsGenerator(g).generate_quantization_parameters(
        _drq_recipe())
    assert _consumer_trans(params, 'fc/w') == [[_QT.QUANTIZE_TENSOR]]
    assert _consumer_trans(params, 'fc/b') == [[_QT.NO_QUANTIZE]]
    assert _consumer_trans(params, 'x') == [[_QT.NO_QUANTIZE]]
    w = params['fc/w'].consumers[0].parameters
    assert w.num_bits == 8 and w.quantized_dimension == 0
    assert w.quantized_data is not None

  def test_weight_only_transformations(self):
    g = self._fc_graph()
    mgr = rm.RecipeManager()
    mgr.add_weight_only_config('.*', qtyping.OpName.FULLY_CONNECTED, 4)
    params = ParamsGenerator(g).generate_quantization_parameters(mgr)
    assert _consumer_trans(params, 'fc/w') == [[_QT.ADD_DEQUANTIZE]]
    assert _consumer_trans(params, 'fc/b') == [[_QT.NO_QUANTIZE]]

  def test_srq_transformations(self):
    g = self._fc_graph()
    params = ParamsGenerator(g).generate_quantization_parameters(
        _srq_recipe(), _mock_qsvs(g))
    assert _consumer_trans(params, 'fc/w') == [[_QT.QUANTIZE_TENSOR]]
    # Bias quantized at input_scale * weight_scale, int32.
    b = params['fc/b'].consumers[0].parameters
    assert b.num_bits == 32
    np.testing.assert_allclose(
        b.scale,
        params['x'].consumers[0].parameters.scale
        * params['fc/w'].consumers[0].parameters.scale, rtol=1e-6)
    # Activation edges: ADD_QUANTIZE in, ADD_DEQUANTIZE out.
    assert [_QT.ADD_QUANTIZE] in _consumer_trans(params, 'x')
    assert _producer_trans(params, 'fc/out') == [_QT.ADD_DEQUANTIZE]

  def test_min_weight_elements(self):
    g = self._fc_graph()  # weight has 128 elements
    mgr = rm.RecipeManager()
    mgr.add_quantization_config(
        '.*', qtyping.OpName.FULLY_CONNECTED,
        qtyping.OpQuantizationConfig(
            weight_tensor_config=qtyping.TensorQuantizationConfig(
                num_bits=8, symmetric=True, granularity=_G.CHANNELWISE),
            compute_precision=qtyping.ComputePrecision.INTEGER,
            min_weight_elements=1000))
    params = ParamsGenerator(g).generate_quantization_parameters(mgr)
    assert _consumer_trans(params, 'fc/w') == [[_QT.NO_QUANTIZE]]


class TestScaleConstraints:

  def test_same_as_input_scale_reshape(self):
    b = GraphBuilder('main')
    x = b.input('x', (1, 4, 4))
    y = b.op('RESHAPE', [x], [(1, 16)], output_names=['reshaped'],
             attrs={'new_shape': [1, 16]})
    b.output(y)
    g = b.finalize()
    params = ParamsGenerator(g).generate_quantization_parameters(
        _srq_recipe(), _mock_qsvs(g))
    in_params = params['x'].consumers[0].parameters
    out_params = params['reshaped'].producer.parameters
    np.testing.assert_array_equal(in_params.scale, out_params.scale)
    np.testing.assert_array_equal(in_params.zero_point, out_params.zero_point)

  def test_same_as_output_scale_concat(self):
    b = GraphBuilder('main')
    x1 = b.input('x1', (1, 4))
    x2 = b.input('x2', (1, 4))
    y = b.op('CONCATENATION', [x1, x2], [(1, 8)], output_names=['cat'],
             attrs={'axis': -1})
    b.output(y)
    g = b.finalize()
    qsvs = _mock_qsvs(g)
    qsvs['cat'] = {'min': np.array([-2.0], np.float32),
                   'max': np.array([2.0], np.float32)}
    params = ParamsGenerator(g).generate_quantization_parameters(
        _srq_recipe(), qsvs)
    out_params = params['cat'].producer.parameters
    for name in ('x1', 'x2'):
      cat_consumer = [c for c in params[name].consumers
                      if c.transformations != [_QT.NO_QUANTIZE]][0]
      np.testing.assert_array_equal(cat_consumer.parameters.scale,
                                    out_params.scale)

  @pytest.mark.parametrize('op,scale8', [
      ('SOFTMAX', 1.0 / 256), ('LOGISTIC', 1.0 / 256), ('TANH', 1.0 / 128),
  ])
  def test_fixed_output_scales(self, op, scale8):
    b = GraphBuilder('main')
    x = b.input('x', (1, 8))
    y = b.unary(op, x, name=f'{op.lower()}_out')
    b.output(y)
    g = b.finalize()
    params = ParamsGenerator(g).generate_quantization_parameters(
        _srq_recipe(), _mock_qsvs(g))
    out_params = params[f'{op.lower()}_out'].producer.parameters
    np.testing.assert_allclose(np.asarray(out_params.scale).ravel()[0],
                               scale8)

  def test_structural_ops_ignore_parameter_operands(self):
    # int32 shape/axis operands are never quantized.
    b = GraphBuilder('main')
    x = b.input('x', (2, 8))
    axis = b.constant('axis', np.array(0, np.int32))
    s0, s1 = b.op('SPLIT', [axis, x], [(1, 8), (1, 8)],
                  output_names=['s0', 's1'], attrs={'num_splits': 2})
    b.output(s0)
    b.output(s1)
    g = b.finalize()
    params = ParamsGenerator(g).generate_quantization_parameters(
        _srq_recipe(), _mock_qsvs(g))
    assert _consumer_trans(params, 'axis') == [[_QT.NO_QUANTIZE]]


class TestGranularities:

  @pytest.mark.parametrize('gran,expected_scale_shape', [
      (_G.TENSORWISE, (1,)),
      (_G.CHANNELWISE, (8,)),
      (_G.BLOCKWISE_32, (8, 2)),
  ])
  def test_weight_scale_shapes(self, gran, expected_scale_shape):
    rng = np.random.default_rng(1)
    b = GraphBuilder('main')
    x = b.input('x', (1, 64))
    y = b.fully_connected(x, rng.normal(size=(8, 64)).astype(np.float32),
                          None, name='fc')
    b.output(y)
    g = b.finalize()
    mgr = rm.RecipeManager()
    mgr.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, 4,
                           granularity=gran)
    params = ParamsGenerator(g).generate_quantization_parameters(mgr)
    w = params['fc/w'].consumers[0].parameters
    assert np.asarray(w.scale).shape == expected_scale_shape
    if gran == _G.BLOCKWISE_32:
      assert w.block_size == 32


class TestNewElementwiseOps:

  def test_comparison_and_arith_ops(self):
    import jax.numpy as jnp
    from ai_edge_quantizer_tpu.ops import impl as ops_impl
    a = jnp.asarray([[2.0, -3.0, 4.0, 1.0]])
    bv = jnp.asarray([[1.0, 2.0, 4.0, -2.0]])
    cases = {
        'LESS': a < bv, 'LESS_EQUAL': a <= bv, 'GREATER': a > bv,
        'GREATER_EQUAL': a >= bv, 'MINIMUM': jnp.minimum(a, bv),
        'POW': jnp.power(jnp.abs(a), 2.0),
        'FLOOR_DIV': jnp.floor_divide(a, 2.0),
        'FLOOR_MOD': jnp.mod(a, 2.0),
    }
    for opcode, want in cases.items():
      fn = ops_impl.OPS[opcode]
      if opcode == 'POW':
        got = fn(None, jnp.abs(a), jnp.asarray(2.0))
      elif opcode in ('FLOOR_DIV', 'FLOOR_MOD'):
        got = fn(None, a, jnp.asarray(2.0))
      else:
        got = fn(None, a, bv)
      np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                 err_msg=opcode)


def _op_constraint():
  from ai_edge_quantizer_tpu.algorithms.uniform import engine
  return engine.OpQuantConstraint


class TestOpTableSweep:
  """Table-driven materialization sweep over EVERY op in the e2e builder
  zoo: asserts the constraint structure the op_library declares (the
  analog of the reference's ~45 op_architecture_tests files).

  QSV mock gives every tensor a DISTINCT range, so scale-equality
  assertions prove propagation rather than coincidence."""

  @staticmethod
  def _distinct_qsvs(graph):
    qsvs = {}
    i = 0
    for sg in graph.subgraphs:
      for t in sg.tensors:
        i += 1
        hi = 1.0 + 0.13 * (i % 17)
        qsvs[t.name] = {'min': np.array([-hi], np.float32),
                        'max': np.array([hi * 1.5], np.float32)}
    return qsvs

  @staticmethod
  def _params_of(entry):
    """First quantize-carrying params on a tensor's edges (or None)."""
    if entry.producer is not None and entry.producer.parameters is not None:
      return entry.producer.parameters
    for c in entry.consumers or []:
      if c.parameters is not None:
        return c.parameters
    return None

  def _sweep_case(self, opcode):
    import sys
    sys.path.insert(0, 'tests')
    import test_e2e_per_op as e2e
    from ai_edge_quantizer_tpu.algorithms.uniform import op_library
    from ai_edge_quantizer_tpu.algorithms.uniform import engine
    from ai_edge_quantizer_tpu.pipeline import instruction_generator

    graph = e2e._BUILDERS[opcode]()
    spec = op_library.OP_SPECS.get(qtyping.OpName(opcode))
    if spec is None:
      pytest.skip(f'{opcode} not in OP_SPECS')
    qsvs = self._distinct_qsvs(graph)
    params = ParamsGenerator(graph).generate_quantization_parameters(
        _srq_recipe(), qsvs)
    # The whole materialization must lower to valid instructions.
    instruction_generator.TransformationInstructionsGenerator(
        graph).quant_params_to_transformation_insts(params)

    sg = graph.subgraphs[0]
    op = next(o for o in sg.ops if o.opcode == opcode)
    t_in = [sg.tensors[t] for t in op.inputs if t >= 0]
    t_out = [sg.tensors[t] for t in op.outputs]
    return spec, params, op, t_in, t_out

  @pytest.mark.parametrize('opcode', sorted(
      {'RESHAPE', 'TRANSPOSE', 'AVERAGE_POOL_2D', 'MAX_POOL_2D', 'SLICE',
       'STRIDED_SLICE', 'PAD', 'MIRROR_PAD', 'SPACE_TO_DEPTH', 'GATHER',
       'GATHER_ND', 'UNPACK', 'BROADCAST_TO', 'REDUCE_MIN', 'SPLIT',
       'RESIZE_BILINEAR', 'RESIZE_NEAREST_NEIGHBOR'}))
  def test_same_as_input_scale(self, opcode):
    spec, params, op, t_in, t_out = self._sweep_case(opcode)
    assert spec.constraint == _op_constraint().SAME_AS_INPUT_SCALE
    src = t_in[0] if 0 not in spec.inputs_to_ignore else t_in[
        [i for i in range(len(t_in)) if i not in spec.inputs_to_ignore][0]]
    in_p = self._params_of(params[src.name])
    assert in_p is not None, f'{opcode}: input has no quant params'
    for t in t_out:
      out_p = params[t.name].producer.parameters
      np.testing.assert_array_equal(
          in_p.scale, out_p.scale,
          err_msg=f'{opcode}: output scale != input scale')
      np.testing.assert_array_equal(in_p.zero_point, out_p.zero_point)

  @pytest.mark.parametrize('opcode', sorted(
      {'CONCATENATION', 'PACK', 'SELECT', 'SELECT_V2', 'MAXIMUM',
       'DYNAMIC_UPDATE_SLICE', 'PADV2'}))
  def test_same_as_output_scale(self, opcode):
    spec, params, op, t_in, t_out = self._sweep_case(opcode)
    assert spec.constraint == _op_constraint().SAME_AS_OUTPUT_SCALE
    out_p = params[t_out[0].name].producer.parameters
    for i, t in enumerate(t_in):
      if i in spec.inputs_to_ignore or t.dtype != 'float32':
        continue
      edges = [c.parameters for c in params[t.name].consumers or []
               if c.parameters is not None]
      assert edges, f'{opcode}: input {t.name} has no quantized consumer'
      found = any(np.array_equal(p.scale, out_p.scale) for p in edges)
      assert found, f'{opcode}: no input edge carries the output scale'

  @pytest.mark.parametrize('opcode,scale,zp', [
      ('SOFTMAX', 1.0 / 256.0, -128),
      ('LOGISTIC', 1.0 / 256.0, -128),
      ('TANH', 1.0 / 128.0, 0),
  ])
  def test_fixed_output_scale(self, opcode, scale, zp):
    spec, params, op, t_in, t_out = self._sweep_case(opcode)
    assert spec.kind == 'fixed_output'
    out_p = params[t_out[0].name].producer.parameters
    np.testing.assert_allclose(np.asarray(out_p.scale).reshape(()), scale,
                               rtol=1e-7)
    assert int(np.asarray(out_p.zero_point).reshape(())) == zp

  @pytest.mark.parametrize('opcode', sorted(
      {'ADD', 'SUB', 'MUL', 'DIV', 'MEAN', 'GELU', 'RELU', 'HARD_SWISH',
       'SQUARED_DIFFERENCE', 'RSQRT', 'SQRT', 'SUM', 'BATCH_MATMUL',
       'EMBEDDING_LOOKUP', 'CONV_2D', 'DEPTHWISE_CONV_2D'}))
  def test_materializes_and_lowers(self, opcode):
    """No-constraint / weighted ops: params generate, instructions valid,
    every output carries quant params under SRQ."""
    spec, params, op, t_in, t_out = self._sweep_case(opcode)
    for t in t_out:
      if t.dtype != 'float32':
        continue
      assert params[t.name].producer is not None, \
          f'{opcode}: output {t.name} has no producer params'

  @pytest.mark.parametrize('opcode', ['CONV_2D', 'DEPTHWISE_CONV_2D'])
  def test_weighted_ops_quantize_weights_and_bias(self, opcode):
    spec, params, op, t_in, t_out = self._sweep_case(opcode)
    assert spec.kind == 'fc_conv'
    w = t_in[spec.weight_index]
    w_edges = _consumer_trans(params, w.name)
    assert [_QT.QUANTIZE_TENSOR] in w_edges, f'{opcode}: weight not packed'
    if len(t_in) > spec.bias_index:
      b = t_in[spec.bias_index]
      bp = params[b.name].consumers[0].parameters
      assert bp.num_bits == 32, f'{opcode}: bias not int32'


class TestModeSweep:
  """DRQ / weight-only mode structure across the op zoo."""

  @pytest.mark.parametrize('opcode', ['CONV_2D', 'DEPTHWISE_CONV_2D',
                                      'EMBEDDING_LOOKUP'])
  def test_weight_only_add_dequantize(self, opcode):
    import sys
    sys.path.insert(0, 'tests')
    import test_e2e_per_op as e2e
    from ai_edge_quantizer_tpu.algorithms.uniform import op_library
    graph = e2e._BUILDERS[opcode]()
    mgr = rm.RecipeManager()
    mgr.add_weight_only_config('.*', qtyping.OpName(opcode), 8)
    params = ParamsGenerator(graph).generate_quantization_parameters(mgr)
    sg = graph.subgraphs[0]
    op = next(o for o in sg.ops if o.opcode == opcode)
    spec = op_library.OP_SPECS[qtyping.OpName(opcode)]
    w_name = sg.tensors[op.inputs[spec.weight_index]].name
    assert [_QT.ADD_DEQUANTIZE] in _consumer_trans(params, w_name), (
        opcode, _consumer_trans(params, w_name))

  @pytest.mark.parametrize('opcode', sorted(
      {'ADD', 'MUL', 'RESHAPE', 'CONCATENATION', 'SOFTMAX', 'MAX_POOL_2D',
       'GELU', 'TRANSPOSE', 'SLICE'}))
  def test_dynamic_config_silently_skips_non_weight_ops(self, opcode):
    """Reference gotcha: unsupported (op, config) pairs are silently
    skipped at lookup — a DRQ-only recipe leaves non-weight ops float
    (ref recipe_manager.py:191-198)."""
    import sys
    sys.path.insert(0, 'tests')
    import test_e2e_per_op as e2e
    graph = e2e._BUILDERS[opcode]()
    mgr = rm.RecipeManager()
    mgr.add_dynamic_config('.*', qtyping.OpName.ALL_SUPPORTED, 8)
    params = ParamsGenerator(graph).generate_quantization_parameters(mgr)
    sg = graph.subgraphs[0]
    op = next(o for o in sg.ops if o.opcode == opcode)
    for tid in list(op.inputs) + list(op.outputs):
      if tid < 0 or sg.tensors[tid].dtype != 'float32':
        continue
      name = sg.tensors[tid].name
      entry = params.get(name)
      if entry is None:
        continue
      for c in entry.consumers or []:
        if c.transformations not in ([_QT.NO_QUANTIZE],):
          # quantization may legitimately come from a NEIGHBORING weight
          # op in the fixture graph; only the op's own weight-free edges
          # must stay float. Accept QUANTIZE_TENSOR only on const data.
          t = sg.tensors[tid]
          is_const = t.buffer >= 0 and \
              graph.buffers[t.buffer].data is not None
          assert is_const, (
              f'{opcode}: non-const edge {name} got {c.transformations} '
              'from a DRQ-only recipe')


class TestSumWideBitConstraint:
  """SUM: the 8-bit kernel has no input/output scale tie; 16-bit acts
  get SAME_AS_INPUT (ref common_quantize.py:500-525)."""

  def _params(self, act_bits, act_sym):
    import sys
    sys.path.insert(0, 'tests')
    import test_e2e_per_op as e2e
    graph = e2e._BUILDERS['SUM']()
    mgr = rm.RecipeManager()
    mgr.add_quantization_config(
        '.*', qtyping.OpName.ALL_SUPPORTED,
        qtyping.OpQuantizationConfig(
            activation_tensor_config=qtyping.TensorQuantizationConfig(
                num_bits=act_bits, symmetric=act_sym,
                granularity=_G.TENSORWISE),
            weight_tensor_config=qtyping.TensorQuantizationConfig(
                num_bits=8, symmetric=True, granularity=_G.CHANNELWISE),
            compute_precision=qtyping.ComputePrecision.INTEGER))
    qsvs = TestOpTableSweep._distinct_qsvs(graph)
    params = ParamsGenerator(graph).generate_quantization_parameters(
        mgr, qsvs)
    sg = graph.subgraphs[0]
    op = next(o for o in sg.ops if o.opcode == 'SUM')
    return params, sg, op

  def test_8bit_no_scale_tie(self):
    params, sg, op = self._params(8, False)
    in_p = params[sg.tensors[op.inputs[0]].name].consumers[0].parameters
    out_p = params[sg.tensors[op.outputs[0]].name].producer.parameters
    assert not np.array_equal(np.asarray(in_p.scale),
                              np.asarray(out_p.scale)), (
        'distinct QSV ranges must give distinct scales at 8 bit')

  def test_16bit_same_as_input(self):
    params, sg, op = self._params(16, True)
    in_p = params[sg.tensors[op.inputs[0]].name].consumers[0].parameters
    out_p = params[sg.tensors[op.outputs[0]].name].producer.parameters
    np.testing.assert_array_equal(np.asarray(in_p.scale),
                                  np.asarray(out_p.scale))
