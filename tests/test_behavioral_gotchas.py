"""Edge-case behaviors the reference's tests enforce (SURVEY.md gotchas)."""

import numpy as np
import pytest

import fixtures
from ai_edge_quantizer_tpu import Quantizer, qtyping
from ai_edge_quantizer_tpu.algorithms.uniform import min_max
from ai_edge_quantizer_tpu.graph import ir
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder


class TestCalibrationOutlierFilter:

  def test_inf_padding_constant_excluded_from_minmax(self):
    """A padv2-style -inf constant must not poison activation ranges
    (reference padv2_inf_max_pool_2d edge case)."""
    op = ir.Op(opcode='PADV2', inputs=[0, 1, 2], outputs=[3])
    b = GraphBuilder('main')
    x = b.input('x', (1, 8))
    pads = b.constant('pads', np.array([[0, 0], [1, 1]], np.int32))
    cval = b.constant('cval', np.array(-np.inf, np.float32))
    y = b.op('PADV2', [x, pads, cval], [(1, 10)], output_names=['y'])
    b.output(y)
    g = b.finalize()
    sg = g.main_subgraph()
    graph_info = qtyping.GraphInfo(subgraph=sg, buffers=g.buffers)
    content = {
        'x': np.array([[1.0, -2.0, 3.0, 0, 0, 0, 0, 0]], np.float32),
        'y': np.array([[-np.inf, 1.0, -2.0, 3.0, 0, 0, 0, 0, 0, -np.inf]],
                      np.float32),
    }
    qsvs = min_max.min_max_calibrate(sg.ops[0], graph_info, content,
                                     inputs_to_ignore=[1])
    # -inf values filtered; range comes from the finite payload.
    assert np.isfinite(qsvs['y']['min'])
    assert qsvs['y']['min'] == -2.0


class TestTwoPassQuantization:

  def test_requantize_keeps_existing_quantized_weights(self):
    """Quantizing an already-(partially-)quantized model leaves existing
    quantized tensors untouched (reference params_generator behavior)."""
    g = fixtures.two_layer_mlp()
    qt1 = Quantizer(g)
    qt1.add_dynamic_config('dense1.*', 'FULLY_CONNECTED', 8)
    first = qt1.quantize().quantized_model
    w1_first = np.array(
        first.tensor_data(first.main_subgraph().tensor_by_name('dense1/w')))

    qt2 = Quantizer(first)
    qt2.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    second = qt2.quantize().quantized_model
    sg = second.main_subgraph()
    # dense1/w was already int8: untouched by the int4 pass.
    assert sg.tensor_by_name('dense1/w').dtype == 'int8'
    np.testing.assert_array_equal(
        np.array(second.tensor_data(sg.tensor_by_name('dense1/w'))),
        w1_first)
    # dense2/w was still float: quantized to int4 now.
    assert sg.tensor_by_name('dense2/w').dtype == 'int4'


class TestScopeStringSemantics:

  def test_scope_is_output_names_with_trailing_semicolon(self):
    g = fixtures.two_layer_mlp()
    sg = g.main_subgraph()
    scope = ir.get_op_scope(sg, sg.ops[0])
    assert scope == 'dense1/out;'

  def test_scope_truncation(self):
    b = GraphBuilder('main')
    x = b.input('x', (1, 4))
    y = b.unary('RELU', x, name='y' * 20000)
    b.output(y)
    g = b.finalize()
    sg = g.main_subgraph()
    assert len(ir.get_op_scope(sg, sg.ops[0])) == 10000
