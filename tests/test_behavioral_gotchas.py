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


# ---------------------------------------------------------------------------
# The full SURVEY.md "Behavioral gotchas to preserve" contract, one test per
# bullet (VERDICT r3 item 9). Each docstring cites the reference source the
# bullet came from; a refactor that changes any of these semantics fails here
# rather than slipping through incidental coverage.
# ---------------------------------------------------------------------------

import warnings as _warnings

from ai_edge_quantizer_tpu.algorithms import manager as algorithm_manager
from ai_edge_quantizer_tpu.algorithms.registry import AlgorithmName
from ai_edge_quantizer_tpu.algorithms.uniform import quant_numerics as qn
from ai_edge_quantizer_tpu.recipe import recipe_manager as rm_lib


def _tensor_cfg(num_bits, symmetric=True,
                granularity=qtyping.QuantGranularity.CHANNELWISE):
  return qtyping.TensorQuantizationConfig(
      num_bits=num_bits, symmetric=symmetric, granularity=granularity)


class TestGotchaContract:
  """SURVEY §"Behavioral gotchas to preserve" — the complete list."""

  def test_scope_is_output_names_semicolon_terminated(self):
    """Bullet 1a: scope string = output tensor names joined with ';' plus a
    trailing ';' (ref tfl_flatbuffer_utils.py:371-417)."""
    g = fixtures.two_layer_mlp()
    sg = g.main_subgraph()
    assert ir.get_op_scope(sg, sg.ops[0]) == 'dense1/out;'

  def test_scope_truncated_at_10k_chars(self):
    """Bullet 1b: scope truncates at 10k chars (ref
    tfl_flatbuffer_utils.py:414-417)."""
    b = GraphBuilder('main')
    x = b.input('x', (1, 4))
    y = b.unary('RELU', x, name='n' * 20000)
    b.output(y)
    sg = b.finalize().main_subgraph()
    assert len(ir.get_op_scope(sg, sg.ops[0])) == 10000

  def test_scope_matching_uses_re_search(self):
    """Bullet 1c: recipe regexes match via re.search (substring), not
    fullmatch (ref recipe_manager.py:188)."""
    rm = rm_lib.RecipeManager()
    rm.add_dynamic_config('ense1', qtyping.OpName.FULLY_CONNECTED, 8)
    key, _ = rm.get_quantization_configs(
        qtyping.OpName.FULLY_CONNECTED, 'dense1/out;')
    assert key == AlgorithmName.MIN_MAX_UNIFORM_QUANT

  def test_later_recipe_entries_override_earlier(self):
    """Bullet 2a: later entries override earlier for the same op
    (ref recipe_manager.py:191-198, last match wins)."""
    rm = rm_lib.RecipeManager()
    rm.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, 8)
    rm.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, 4)
    _, cfg = rm.get_quantization_configs(
        qtyping.OpName.FULLY_CONNECTED, 'dense1/out;')
    assert cfg.weight_tensor_config.num_bits == 4

  def test_invalid_config_for_op_is_silently_skipped(self):
    """Bullet 2b: an (op, config) pair the algorithm rejects is skipped
    during lookup — no error, earlier match stays (ref
    recipe_manager.py:191-198)."""
    rm = rm_lib.RecipeManager()
    # ALL_SUPPORTED entries skip the add-time check (they may be valid for
    # only a subset of ops); asymmetric-weight integer compute is illegal
    # for FC, so lookup must skip the entry WITHOUT raising and resolve to
    # NO_QUANTIZE.
    rm.add_quantization_config(
        '.*', qtyping.OpName.ALL_SUPPORTED,
        qtyping.OpQuantizationConfig(
            weight_tensor_config=_tensor_cfg(4, symmetric=False),
            compute_precision=qtyping.ComputePrecision.INTEGER),
        AlgorithmName.MIN_MAX_UNIFORM_QUANT)
    key, _ = rm.get_quantization_configs(
        qtyping.OpName.FULLY_CONNECTED, 'dense1/out;')
    assert key == AlgorithmName.NO_QUANTIZE
    # Add-time validation DOES reject an explicit invalid (op, config) pair.
    with pytest.raises(ValueError):
      rm.add_quantization_config(
          '.*', qtyping.OpName.FULLY_CONNECTED,
          qtyping.OpQuantizationConfig(
              weight_tensor_config=_tensor_cfg(4, symmetric=False),
              compute_precision=qtyping.ComputePrecision.INTEGER),
          AlgorithmName.MIN_MAX_UNIFORM_QUANT)

  def test_need_calibration_iff_srq_or_gptq(self):
    """Bullet 3: need_calibration ⇔ any SRQ entry or GPTQ
    (ref recipe_manager.py:250-262)."""
    rm = rm_lib.RecipeManager()
    rm.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, 8)
    assert not rm.need_calibration()
    rm.add_static_config('.*', qtyping.OpName.FULLY_CONNECTED, 8, 8)
    assert rm.need_calibration()
    rm2 = rm_lib.RecipeManager()
    rm2.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, 4,
                           algorithm_key=AlgorithmName.GPTQ)
    assert rm2.need_calibration()

  def test_asymmetric_weights_only_for_weight_only(self):
    """Bullet 4: weights symmetric always for integer compute; asymmetric
    allowed only for weight-only (explicit dequantize) weights
    (ref recipe_manager.py:291,393-397)."""
    asym = qtyping.OpQuantizationConfig(
        weight_tensor_config=_tensor_cfg(8, symmetric=False),
        compute_precision=qtyping.ComputePrecision.INTEGER)
    with pytest.raises(ValueError):
      algorithm_manager.check_op_quantization_config(
          AlgorithmName.MIN_MAX_UNIFORM_QUANT,
          qtyping.OpName.FULLY_CONNECTED, asym)
    weight_only_asym = qtyping.OpQuantizationConfig(
        weight_tensor_config=_tensor_cfg(8, symmetric=False),
        compute_precision=qtyping.ComputePrecision.FLOAT,
        explicit_dequantize=True)
    algorithm_manager.check_op_quantization_config(  # must not raise
        AlgorithmName.MIN_MAX_UNIFORM_QUANT,
        qtyping.OpName.FULLY_CONNECTED, weight_only_asym)

  def test_narrow_range_only_symmetric_ge8bit(self):
    """Bullet 5: narrow range (qmin+1) applies only to symmetric >=8-bit
    (ref uniform_quantize_tensor.py:306-315)."""
    from ai_edge_quantizer_tpu.algorithms.uniform import quant_numerics
    assert quant_numerics.use_narrow_range(True, 8)
    assert quant_numerics.use_narrow_range(True, 16)
    assert not quant_numerics.use_narrow_range(True, 4)
    assert not quant_numerics.use_narrow_range(False, 8)
    # And it is enforced in quantize_array: symmetric int8 never emits -128.
    params = qtyping.UniformQuantParams(
        num_bits=8, quantized_dimension=None,
        scale=np.array([1.0], np.float32),
        zero_point=np.array([0], np.int8), symmetric=True)
    q = quant_numerics.quantize_array(
        np.array([-1000.0, 1000.0], np.float32), params)
    assert q.min() == -127 and q.max() == 127

  def test_bias_scale_fixed_and_promoted_to_int64_for_int16_acts(self):
    """Bullet 6: bias scale = input_scale*weight_scale, int32; promoted to
    int64 when activations are int16 (ref
    uniform_quantize_tensor.py:412-489)."""
    in_p8 = qtyping.UniformQuantParams(
        num_bits=8, quantized_dimension=None,
        scale=np.array([0.02], np.float32),
        zero_point=np.array([3], np.int8), symmetric=False)
    w_p = qtyping.UniformQuantParams(
        num_bits=8, quantized_dimension=0,
        scale=np.array([0.1, 0.2], np.float32),
        zero_point=np.array([0, 0], np.int8), symmetric=True)
    bias = np.array([1.0, -2.0], np.float32)
    bp = qn.quantize_bias(bias, in_p8, w_p)
    assert bp.num_bits == 32 and bp.quantized_data.dtype == np.int32
    np.testing.assert_allclose(bp.scale, [0.002, 0.004], rtol=1e-6)
    in_p16 = qtyping.UniformQuantParams(
        num_bits=16, quantized_dimension=None,
        scale=np.array([0.02], np.float32),
        zero_point=np.array([0], np.int16), symmetric=True)
    bp16 = qn.quantize_bias(bias, in_p16, w_p)
    assert bp16.num_bits == 64 and bp16.quantized_data.dtype == np.int64

  def test_min_weight_elements_skips_small_weights(self):
    """Bullet 7a: weights with fewer than min_weight_elements stay float
    (ref common_quantize.py:557-565)."""
    g = fixtures.two_layer_mlp()
    qt = Quantizer(g)
    qt.update_quantization_recipe(
        '.*', qtyping.OpName.FULLY_CONNECTED,
        qtyping.OpQuantizationConfig(
            weight_tensor_config=_tensor_cfg(8),
            compute_precision=qtyping.ComputePrecision.INTEGER,
            min_weight_elements=10**9))
    out = qt.quantize().quantized_model
    sg = out.main_subgraph()
    assert sg.tensor_by_name('dense1/w').dtype == 'float32'
    assert sg.tensor_by_name('dense2/w').dtype == 'float32'

  def test_prequantized_weights_skipped_with_warning(self):
    """Bullet 7b + 11: already-quantized weights are skipped on re-quantize
    and a partial-quantization warning fires (ref
    common_quantize.py:398-412, params_generator.py:42-47)."""
    g = fixtures.two_layer_mlp()
    qt1 = Quantizer(g)
    qt1.add_dynamic_config('dense1.*', 'FULLY_CONNECTED', 8)
    first = qt1.quantize().quantized_model
    with pytest.warns(UserWarning, match='partially quantized'):
      qt2 = Quantizer(first)
      qt2.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
      second = qt2.quantize().quantized_model
    sg = second.main_subgraph()
    assert sg.tensor_by_name('dense1/w').dtype == 'int8'  # untouched
    assert sg.tensor_by_name('dense2/w').dtype == 'int4'  # newly quantized

  def test_blockwise_scales_round_to_fp16_7bit_mantissa(self):
    """Bullet 8: blockwise scales are fp16 with a 7-bit (bfloat16) mantissa
    (ref uniform_quantize_tensor.py:577-581); asymmetric blockwise is
    rejected (ref common_utils.py:42-45)."""
    import ml_dtypes
    rng = np.random.default_rng(0)
    mn = -rng.random((4, 8), np.float32) * 7
    mx = rng.random((4, 8), np.float32) * 13
    _, scale = qn.compute_zp_scale(
        mn, mx, num_bits=4, symmetric=True,
        granularity=qtyping.QuantGranularity.BLOCKWISE_32)
    np.testing.assert_array_equal(
        scale, scale.astype(ml_dtypes.bfloat16).astype(np.float32))
    with pytest.raises(ValueError):
      algorithm_manager.check_op_quantization_config(
          AlgorithmName.MIN_MAX_UNIFORM_QUANT,
          qtyping.OpName.FULLY_CONNECTED,
          qtyping.OpQuantizationConfig(
              weight_tensor_config=_tensor_cfg(
                  4, symmetric=False,
                  granularity=qtyping.QuantGranularity.BLOCKWISE_32),
              compute_precision=qtyping.ComputePrecision.INTEGER))

  def test_blockwise_limited_to_fc_and_embedding(self):
    """Bullet 8b: blockwise granularity is FC/embedding-only
    (ref common_utils.py:80-101)."""
    with pytest.raises(ValueError):
      algorithm_manager.check_op_quantization_config(
          AlgorithmName.MIN_MAX_UNIFORM_QUANT,
          qtyping.OpName.SOFTMAX,
          qtyping.OpQuantizationConfig(
              activation_tensor_config=_tensor_cfg(
                  8, granularity=qtyping.QuantGranularity.TENSORWISE),
              weight_tensor_config=_tensor_cfg(
                  4, granularity=qtyping.QuantGranularity.BLOCKWISE_32),
              compute_precision=qtyping.ComputePrecision.INTEGER))

  def test_shared_tensor_conflicting_params_duplicates_tensor(self):
    """Bullet 9a: one constant tensor consumed under different quant params
    gets duplicated per consumer (ref params_generator.py:410-463)."""
    g = fixtures.shared_weight_two_fc()
    qt = Quantizer(g)
    qt.add_dynamic_config('fc1.*', 'FULLY_CONNECTED', 8)
    qt.add_dynamic_config('fc2.*', 'FULLY_CONNECTED', 4)
    out = qt.quantize().quantized_model
    sg = out.main_subgraph()
    weight_tids = {op.inputs[1] for op in sg.ops
                   if op.opcode == 'FULLY_CONNECTED'}
    assert len(weight_tids) == 2  # the shared tensor was split
    dtypes = sorted(sg.tensors[t].dtype for t in weight_tids)
    assert dtypes == ['int4', 'int8']

  def test_shared_buffer_conflicting_params_duplicates_buffer(self):
    """Bullet 9b: distinct tensors sharing one buffer with different params
    get fresh buffers (ref params_generator.py:410-463)."""
    g = fixtures.shared_buffer_two_tensors()
    qt = Quantizer(g)
    qt.add_dynamic_config('fc1.*', 'FULLY_CONNECTED', 8)
    qt.add_dynamic_config('fc2.*', 'FULLY_CONNECTED', 4)
    out = qt.quantize().quantized_model
    sg = out.main_subgraph()
    buf_a = sg.tensor_by_name('w_a').buffer
    buf_b = sg.tensor_by_name('w_b').buffer
    assert buf_a != buf_b
    assert {sg.tensor_by_name('w_a').dtype,
            sg.tensor_by_name('w_b').dtype} == {'int8', 'int4'}

  def test_float_test_data_auto_quantized_at_model_inputs(self):
    """Bullet 10: float test/calibration data is quantized automatically
    when the model input tensor is quantized
    (ref tfl_interpreter_utils.py:110-123)."""
    from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
    g = fixtures.single_fc()
    qt = Quantizer(g, 'default_a8w8')
    rng = np.random.default_rng(0)
    sig = g.signatures[0]
    data = {sig.signature_key: [
        {'x': rng.standard_normal(
            g.main_subgraph().tensors[tid].shape).astype(np.float32)}
        for tid in [list(sig.inputs.values())[0]]
        for _ in range(4)]}
    cr = qt.calibrate(data)
    quantized = qt.quantize(cr).quantized_model
    in_tensor = quantized.main_subgraph().tensors[
        list(quantized.signatures[0].inputs.values())[0]]
    assert in_tensor.dtype == 'int8'  # input really is quantized
    # Feeding FLOAT data must work: the executor quantizes at the boundary.
    runner = GraphExecutor(quantized).signature_runner(sig.signature_key)
    out = runner(data[sig.signature_key][0])
    assert all(np.isfinite(np.asarray(v, np.float32)).all()
               for v in out.values())
