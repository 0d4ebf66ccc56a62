"""CLI and GenAI-bundle tests."""

import json
import os

import numpy as np

import fixtures
from ai_edge_quantizer_tpu import cli
from ai_edge_quantizer_tpu.graph import serialize
from ai_edge_quantizer_tpu.models import bundles, gemma


class TestCli:

  def test_quantize_and_validate(self, tmp_path):
    g = fixtures.two_layer_mlp()
    model_path = str(tmp_path / 'model.aeqg')
    serialize.save_graph(g, model_path)
    rc = cli.main([
        '--model_file', model_path,
        '--recipe', 'dynamic_wi8_afp32',
        '--output_dir', str(tmp_path / 'out'),
        '--validate',
    ])
    assert rc == 0
    out_model = tmp_path / 'out' / 'model.aeqg'
    assert out_model.exists()
    g2 = serialize.load_graph(str(out_model))
    assert g2.main_subgraph().tensor_by_name('dense1/w').dtype == 'int8'
    report = json.loads(
        (tmp_path / 'out' / 'model_comparison_result.json').read_text())
    assert report['reduced_size_percentage'] > 60

  def test_recipe_from_json_file(self, tmp_path):
    g = fixtures.single_fc()
    model_path = str(tmp_path / 'm.aeqg')
    serialize.save_graph(g, model_path)
    recipe = [{
        'regex': '.*', 'operation': 'FULLY_CONNECTED',
        'algorithm_key': 'min_max_uniform_quantize',
        'op_config': {
            'weight_tensor_config': {
                'num_bits': 4, 'symmetric': True,
                'granularity': 'CHANNELWISE', 'dtype': 'INT'},
            'compute_precision': 'INTEGER',
            'explicit_dequantize': False,
        },
    }]
    recipe_path = tmp_path / 'r.json'
    recipe_path.write_text(json.dumps(recipe))
    rc = cli.main(['--model_file', model_path, '--recipe', str(recipe_path),
                   '--output_dir', str(tmp_path / 'out')])
    assert rc == 0
    g2 = serialize.load_graph(str(tmp_path / 'out' / 'm.aeqg'))
    assert g2.main_subgraph().tensor_by_name('fc/w').dtype == 'int4'

  def test_static_recipe_with_random_calibration(self, tmp_path):
    g = fixtures.two_layer_mlp()
    model_path = str(tmp_path / 'm.aeqg')
    serialize.save_graph(g, model_path)
    rc = cli.main(['--model_file', model_path, '--recipe', 'default_a8w8',
                   '--output_dir', str(tmp_path / 'out'),
                   '--calibration_samples', '4'])
    assert rc == 0


class TestBundles:

  def _toy_bundle(self):
    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=1, prefill_len=4)
    emb = fixtures.single_fc(seed=9)
    return bundles.Bundle(sections=[
        bundles.BundleSection(name='embedder', model_type='embedder',
                              graph=emb),
        bundles.BundleSection(name='lm', model_type='decode', graph=g),
    ], metadata={'family': 'toy'})

  def test_save_load_roundtrip(self, tmp_path):
    b = self._toy_bundle()
    path = str(tmp_path / 'model.aeqb')
    b.save(path)
    b2 = bundles.Bundle.load(path)
    assert [s.name for s in b2.sections] == ['embedder', 'lm']
    assert b2.section_by_name('lm').model_type == 'decode'
    assert b2.metadata == {'family': 'toy'}

  def test_per_model_type_quantization(self, tmp_path):
    from ai_edge_quantizer_tpu.recipe import recipe as recipe_presets
    b = self._toy_bundle()
    mapping = {
        'decode': recipe_presets.dynamic_wi4_afp32(),
        'default': recipe_presets.dynamic_wi8_afp32(),
    }
    qb = bundles.quantize_bundle(b, mapping)
    lm = qb.section_by_name('lm').graph
    emb = qb.section_by_name('embedder').graph
    # decode section got int4 FC weights, embedder (default) int8.
    lm_w = [t for sg in lm.subgraphs for t in sg.tensors
            if t.dtype == 'int4']
    assert lm_w
    assert emb.main_subgraph().tensor_by_name('fc/w').dtype == 'int8'

  def test_bundle_cli(self, tmp_path):
    b = self._toy_bundle()
    path = str(tmp_path / 'model.aeqb')
    b.save(path)
    rc = cli.main(['--model_file', path, '--recipe', 'dynamic_wi8_afp32',
                   '--output_dir', str(tmp_path / 'out')])
    assert rc == 0
    qb = bundles.Bundle.load(str(tmp_path / 'out' / 'model.aeqb'))
    assert qb.section_by_name(
        'embedder').graph.main_subgraph().tensor_by_name(
            'fc/w').dtype == 'int8'
