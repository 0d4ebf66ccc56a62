"""Instruction generator unit tests: horizontal/vertical optimization,
duplication cleanup, requantize fusion, validity (the reference's largest
test surface, transformation_instruction_generator_test.py)."""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.pipeline.instruction_generator import (
    TransformationInstructionsGenerator, check_dq_q_elimination,
    check_horizontal_optimization, check_replace_dq_q_with_rq)

_QT = qtyping.QuantTransformation


def _params(scale=0.5, bits=8):
  return qtyping.UniformQuantParams(
      num_bits=bits, quantized_dimension=None,
      scale=np.array([scale], np.float32),
      zero_point=np.array([0], np.int8), symmetric=True)


def _o2t(op_id, trans, params=None):
  return qtyping.OpToTensorParams(
      subgraph_op_id=op_id, transformations=list(trans), parameters=params)


def _fanout_graph(n_consumers=2):
  """x -> producer FC -> t consumed by n RELU ops."""
  rng = np.random.default_rng(0)
  b = GraphBuilder('main')
  x = b.input('x', (1, 8))
  t = b.fully_connected(x, rng.standard_normal((8, 8)).astype(np.float32),
                        None, name='prod')
  outs = []
  for i in range(n_consumers):
    outs.append(b.unary('RELU', t, name=f'relu_{i}'))
  for o in outs:
    b.output(o)
  return b.finalize()


class TestChecks:

  def test_dq_q_elimination_same_params(self):
    p = _params()
    prod = qtyping.TransformationInst(_QT.ADD_DEQUANTIZE, 0, 0, [1], p)
    cons = qtyping.TransformationInst(_QT.ADD_QUANTIZE, 0, 0, [1], p)
    assert check_dq_q_elimination(prod, cons)
    assert not check_replace_dq_q_with_rq(prod, cons)

  def test_dq_q_requantize_different_params(self):
    prod = qtyping.TransformationInst(
        _QT.ADD_DEQUANTIZE, 0, 0, [1], _params(0.5))
    cons = qtyping.TransformationInst(
        _QT.ADD_QUANTIZE, 0, 0, [1], _params(0.25))
    assert not check_dq_q_elimination(prod, cons)
    assert check_replace_dq_q_with_rq(prod, cons)

  def test_horizontal_same_params_merge(self):
    p = _params()
    a = _o2t(1, [_QT.ADD_QUANTIZE], p)
    b = _o2t(2, [_QT.ADD_QUANTIZE], p)
    c = _o2t(3, [_QT.ADD_QUANTIZE], _params(0.9))
    assert check_horizontal_optimization(a, b, 0)
    assert not check_horizontal_optimization(a, c, 0)


class TestTensorInstructions:

  def _gen(self, graph):
    return TransformationInstructionsGenerator(graph)

  def test_vertical_elimination_to_quantize_tensor(self):
    g = _fanout_graph(2)
    gen = self._gen(g)
    p = _params()
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], p),
        consumers=[_o2t(1, [_QT.ADD_QUANTIZE], p),
                   _o2t(2, [_QT.ADD_QUANTIZE], p)],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    kinds = [i.transformation for i in insts.instructions]
    assert kinds == [_QT.QUANTIZE_TENSOR]
    assert sorted(insts.instructions[0].consumers) == [1, 2]

  def test_vertical_requantize_on_mismatched_params(self):
    g = _fanout_graph(1)
    gen = self._gen(g)
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], _params(0.5)),
        consumers=[_o2t(1, [_QT.ADD_QUANTIZE], _params(0.25))],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    kinds = [i.transformation for i in insts.instructions]
    # Unconstrained FC producer: the QUANTIZE_TENSOR + requantize pair
    # fuses into one QUANTIZE_TENSOR at the consumer's scale.
    assert kinds in ([_QT.QUANTIZE_TENSOR],
                     [_QT.QUANTIZE_TENSOR, _QT.ADD_QUANTIZE])
    assert np.allclose(
        np.asarray(insts.instructions[-1].parameters.scale), 0.25)

  def test_horizontal_groups_mixed_consumers(self):
    g = _fanout_graph(3)
    gen = self._gen(g)
    p = _params()
    q = _params(0.1)
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.NO_QUANTIZE]),
        consumers=[_o2t(1, [_QT.ADD_QUANTIZE], p),
                   _o2t(2, [_QT.ADD_QUANTIZE], p),
                   _o2t(3, [_QT.ADD_QUANTIZE], q)],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    add_qs = [i for i in insts.instructions
              if i.transformation == _QT.ADD_QUANTIZE]
    assert len(add_qs) == 2
    grouped = next(i for i in add_qs if len(i.consumers) == 2)
    assert sorted(grouped.consumers) == [1, 2]

  def test_validity_error_quantized_and_unquantized(self):
    g = _fanout_graph(2)
    gen = self._gen(g)
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.QUANTIZE_TENSOR], _params()),
        consumers=[_o2t(1, [_QT.NO_QUANTIZE]),
                   _o2t(2, [_QT.QUANTIZE_TENSOR], _params())],
    )}
    with pytest.raises(ValueError, match='quantized and unquantized'):
      gen.quant_params_to_transformation_insts(params)

  def test_dq_no_quant_keeps_dequantize_for_float_consumers(self):
    g = _fanout_graph(2)
    gen = self._gen(g)
    p = _params()
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], p),
        consumers=[_o2t(1, [_QT.NO_QUANTIZE]),
                   _o2t(2, [_QT.NO_QUANTIZE])],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    kinds = [i.transformation for i in insts.instructions]
    assert kinds == [_QT.ADD_DEQUANTIZE]
    assert sorted(insts.instructions[0].consumers) == [1, 2]

  def test_duplicate_tensor_last_removed(self):
    g = _fanout_graph(2)
    gen = self._gen(g)
    p = _params()
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=None,
        consumers=[_o2t(1, [_QT.DUPLICATE_TENSOR, _QT.QUANTIZE_TENSOR], p),
                   _o2t(2, [_QT.DUPLICATE_TENSOR, _QT.QUANTIZE_TENSOR],
                        _params(0.1))],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    dups = [i for i in insts.instructions
            if i.transformation == _QT.DUPLICATE_TENSOR]
    assert len(dups) == 1
