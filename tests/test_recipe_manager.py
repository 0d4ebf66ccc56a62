"""Recipe manager semantics tests (parity with reference behaviors)."""

import pytest

from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.algorithms.registry import AlgorithmName
from ai_edge_quantizer_tpu.recipe import recipe_manager as rm

_Op = qtyping.OpName


def _drq_config(bits=8):
  return qtyping.OpQuantizationConfig(
      weight_tensor_config=qtyping.TensorQuantizationConfig(
          num_bits=bits, symmetric=True,
          granularity=qtyping.QuantGranularity.CHANNELWISE),
      compute_precision=qtyping.ComputePrecision.INTEGER,
  )


class TestAddAndLookup:

  def test_last_match_wins(self):
    mgr = rm.RecipeManager()
    mgr.add_quantization_config('.*', _Op.FULLY_CONNECTED, _drq_config(8))
    mgr.add_quantization_config('block_1.*', _Op.FULLY_CONNECTED,
                                _drq_config(4))
    key, cfg = mgr.get_quantization_configs(
        _Op.FULLY_CONNECTED, 'block_1/fc/out;')
    assert cfg.weight_tensor_config.num_bits == 4
    key, cfg = mgr.get_quantization_configs(
        _Op.FULLY_CONNECTED, 'block_2/fc/out;')
    assert cfg.weight_tensor_config.num_bits == 8

  def test_fallback_no_quantize(self):
    mgr = rm.RecipeManager()
    mgr.add_quantization_config('block_1.*', _Op.FULLY_CONNECTED,
                                _drq_config())
    key, _ = mgr.get_quantization_configs(_Op.SOFTMAX, 'block_1/fc/out;')
    assert key == AlgorithmName.NO_QUANTIZE
    key, _ = mgr.get_quantization_configs(
        _Op.FULLY_CONNECTED, 'elsewhere/out;')
    assert key == AlgorithmName.NO_QUANTIZE

  def test_same_op_overwrites(self):
    mgr = rm.RecipeManager()
    mgr.add_quantization_config('.*', _Op.FULLY_CONNECTED, _drq_config(8))
    mgr.add_quantization_config('.*', _Op.FULLY_CONNECTED, _drq_config(4))
    recipe = mgr.get_quantization_recipe()
    assert len(recipe) == 1
    assert recipe[0]['op_config']['weight_tensor_config']['num_bits'] == 4

  def test_all_supported_clears_scope(self):
    mgr = rm.RecipeManager()
    mgr.add_quantization_config('.*', _Op.FULLY_CONNECTED, _drq_config(4))
    mgr.add_quantization_config('.*', _Op.ALL_SUPPORTED, _drq_config(8))
    recipe = mgr.get_quantization_recipe()
    assert len(recipe) == 1
    assert recipe[0]['operation'] == '*'

  def test_invalid_config_raises_at_add(self):
    mgr = rm.RecipeManager()
    # DEPTHWISE_CONV_2D has no blockwise support in the default policy.
    cfg = qtyping.OpQuantizationConfig(
        weight_tensor_config=qtyping.TensorQuantizationConfig(
            num_bits=4, symmetric=True,
            granularity=qtyping.QuantGranularity.BLOCKWISE_32),
        compute_precision=qtyping.ComputePrecision.INTEGER,
    )
    with pytest.raises(ValueError):
      mgr.add_quantization_config('.*', _Op.DEPTHWISE_CONV_2D, cfg)

  def test_invalid_entries_silently_skipped_at_lookup(self):
    mgr = rm.RecipeManager()
    # '*' op entries bypass add-time validation; SOFTMAX + DRQ config is
    # invalid so lookup must skip it and fall back.
    mgr.add_quantization_config('.*', _Op.ALL_SUPPORTED, _drq_config(8))
    key, _ = mgr.get_quantization_configs(_Op.SOFTMAX, 'model/softmax;')
    assert key == AlgorithmName.NO_QUANTIZE
    # But FC resolves fine from the same wildcard.
    key, cfg = mgr.get_quantization_configs(_Op.FULLY_CONNECTED, 'model/fc;')
    assert key == AlgorithmName.MIN_MAX_UNIFORM_QUANT

  def test_unknown_algorithm_raises(self):
    mgr = rm.RecipeManager()
    with pytest.raises(ValueError, match='algorithm'):
      mgr.add_quantization_config('.*', _Op.FULLY_CONNECTED, _drq_config(),
                                  algorithm_key='nope')

  def test_skip_checks_escape_hatch(self):
    mgr = rm.RecipeManager()
    cfg = qtyping.OpQuantizationConfig(
        weight_tensor_config=qtyping.TensorQuantizationConfig(
            num_bits=3, symmetric=True),  # 3 bits not in any policy
        compute_precision=qtyping.ComputePrecision.INTEGER,
        skip_checks=True,
    )
    mgr.add_quantization_config('.*', _Op.FULLY_CONNECTED, cfg)  # no raise


class TestJsonRoundTrip:

  def test_round_trip(self):
    mgr = rm.RecipeManager()
    mgr.add_quantization_config('.*', _Op.FULLY_CONNECTED, _drq_config(8))
    mgr.add_static_config('.*attn.*', _Op.CONV_2D, 8, 8)
    recipe = mgr.get_quantization_recipe()
    mgr2 = rm.RecipeManager()
    mgr2.load_quantization_recipe(recipe)
    assert mgr2.get_quantization_recipe() == recipe

  def test_need_calibration(self):
    mgr = rm.RecipeManager()
    mgr.add_dynamic_config('.*', _Op.FULLY_CONNECTED, 8)
    assert not mgr.need_calibration()
    mgr.add_static_config('.*', _Op.CONV_2D, 8, 8)
    assert mgr.need_calibration()

  def test_static_symmetry_rules(self):
    mgr = rm.RecipeManager()
    mgr.add_static_config('.*', _Op.FULLY_CONNECTED, 16, 8)
    recipe = mgr.get_quantization_recipe()
    act = recipe[0]['op_config']['activation_tensor_config']
    assert act['symmetric'] is True  # int16 symmetric
    mgr2 = rm.RecipeManager()
    mgr2.add_static_config('.*', _Op.FULLY_CONNECTED, 8, 8)
    act8 = mgr2.get_quantization_recipe()[0]['op_config'][
        'activation_tensor_config']
    assert act8['symmetric'] is False  # int8 asymmetric


class TestPresets:

  @pytest.mark.parametrize('name', [
      'dynamic_wi8_afp32', 'dynamic_wi4_afp32', 'default_a8w8',
      'default_a16w8', 'default_af32w8float', 'default_af32w4float',
      'dynamic_legacy_wi8_afp32',
      'gemma_mixed48', 'gemma_mixed48_b32', 'gemma_mixed48_b64',
      'gemma_mixed48_hr',
  ])
  def test_presets_load(self, name):
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    mgr = rm.RecipeManager()
    mgr.load_quantization_recipe(recipe_utils.resolve_recipe(name))
    assert mgr.get_quantization_recipe()

  def test_legacy_min_weight_elements(self):
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    recipe = recipe_utils.resolve_recipe('dynamic_legacy_wi8_afp32')
    assert recipe[0]['op_config']['min_weight_elements'] == 1024

  def test_gemma_mixed_variants(self):
    """_hr uses the decomposed rotation on 4-bit FCs; _b64 uses
    BLOCKWISE_64 (reference recipe.py:343-397 variants)."""
    from ai_edge_quantizer_tpu.recipe import recipe as recipe_lib
    hr = recipe_lib.gemma_mixed48_hr()
    assert hr[0]['algorithm_key'] == 'DECOMPOSED_HADAMARD_ROTATION'
    assert hr[0]['op_config']['weight_tensor_config']['num_bits'] == 4
    b64 = recipe_lib.gemma_mixed48_b64()
    assert b64[0]['op_config']['weight_tensor_config'][
        'granularity'] == 'BLOCKWISE_64'

  @pytest.mark.parametrize('name', [
      'gemma_mixed48', 'gemma_mixed48_hr', 'gemma_mixed48_b32',
      'gemma_mixed48_b64',
  ])
  def test_bundle_mapping_resolution(self, name):
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    mapping = recipe_utils.resolve_recipe_mapping(name)
    assert set(mapping) == {'default', 'embedder'}
    mgr = rm.RecipeManager()
    for recipe in mapping.values():
      mgr.load_quantization_recipe(recipe)


class TestPolicyExamples:

  @pytest.mark.parametrize('fname,expect_op', [
      ('example_wide_int4_policy.json', _Op.FULLY_CONNECTED),
      ('example_mixed_precision_policy.json', _Op.SOFTMAX),
      ('strict_fc_int4_policy.json', _Op.FULLY_CONNECTED),
  ])
  def test_policy_files_parse(self, fname, expect_op):
    import os
    from ai_edge_quantizer_tpu.recipe import default_policy
    path = os.path.join(os.path.dirname(rm.__file__), 'policies', fname)
    with open(path) as f:
      policy = default_policy.policy_from_json(f.read())
    assert expect_op in policy and policy[expect_op]

  def test_load_config_policy_merges(self):
    """User policies extend the default (reference
    update_default_config_policy semantics)."""
    import os
    from ai_edge_quantizer_tpu.recipe import default_policy
    path = os.path.join(os.path.dirname(rm.__file__), 'policies',
                        'example_mixed_precision_policy.json')
    with open(path) as f:
      merged = default_policy.update_default_config_policy(f.read())
    # Everything default-legal stays legal after the merge.
    for op, cfgs in default_policy.DEFAULT_CONFIG_CHECK_POLICY.items():
      for cfg in cfgs:
        assert cfg in merged[op]


class TestEveryPresetRoundTrips:
  """Every named preset and stock recipe JSON must load into the
  manager, round-trip through to_dict/from_dict, and re-resolve to the
  same recipe — the compatibility surface with reference recipes."""

  def test_named_presets(self):
    from ai_edge_quantizer_tpu.recipe import recipe as presets
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    from ai_edge_quantizer_tpu.recipe.recipe_manager import RecipeManager
    assert len(presets.NAMED_RECIPES) >= 15
    for name in sorted(presets.NAMED_RECIPES):
      recipe = recipe_utils.resolve_recipe(name)
      mgr = RecipeManager()
      mgr.load_quantization_recipe(recipe)
      dumped = mgr.get_quantization_recipe()
      mgr2 = RecipeManager()
      mgr2.load_quantization_recipe(dumped)
      assert mgr2.get_quantization_recipe() == dumped, name

  def test_stock_recipe_files(self):
    import glob
    import json
    import os
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    from ai_edge_quantizer_tpu.recipe.recipe_manager import RecipeManager
    base = os.path.join(
        os.path.dirname(recipe_utils.__file__), 'recipes')
    files = sorted(glob.glob(os.path.join(base, '*.json')))
    assert len(files) >= 10
    for path in files:
      recipe = recipe_utils.resolve_recipe(path)
      mgr = RecipeManager()
      mgr.load_quantization_recipe(recipe)
      dumped = mgr.get_quantization_recipe()
      assert json.dumps(dumped), path

  def test_litertlm_mappings(self):
    from ai_edge_quantizer_tpu.recipe import recipe as presets
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    for name in sorted(presets.LITERTLM_RECIPE_MAPPINGS):
      mapping = recipe_utils.resolve_recipe_mapping(name)
      assert 'default' in mapping, name
