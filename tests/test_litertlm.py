"""`.litertlm` binary container tests: format round-trip, per-section
quantization, CLI acceptance (reference litertlm_utils.py + aeq.py:61-181
parity)."""

import os

import numpy as np
import pytest

from ai_edge_quantizer_tpu.graph import litertlm

_REF_FIXTURE = ('/root/reference/ai_edge_quantizer/tests/models/'
                'conv_fc_mnist.litertlm')


def _make_tflite_bytes(seed=0):
  tf = pytest.importorskip('tensorflow')
  rng = np.random.default_rng(seed)

  class M(tf.Module):

    def __init__(self):
      self.w1 = tf.constant(rng.normal(size=(16, 32)).astype(np.float32) * .3)
      self.w2 = tf.constant(rng.normal(size=(32, 8)).astype(np.float32) * .3)

    @tf.function(input_signature=[tf.TensorSpec((1, 16), tf.float32)])
    def __call__(self, x):
      return tf.matmul(tf.nn.relu(tf.matmul(x, self.w1)), self.w2)

  m = M()
  conv = tf.lite.TFLiteConverter.from_concrete_functions(
      [m.__call__.get_concrete_function()], m)
  return conv.convert()


class TestContainerFormat:

  def test_write_read_round_trip(self, tmp_path):
    path = str(tmp_path / 'a.litertlm')
    tok = b'tokenizer-bytes' * 100
    model = b'MDLB' + bytes(range(256)) * 10
    litertlm.write_litertlm(path, [
        (tok, litertlm.SECTION_GENERIC_BINARY,
         {'model_type': 'tokenizer', 'vocab': 32000}),
        (model, litertlm.SECTION_TFLITE_MODEL,
         {'model_type': 'tf_lite_prefill_decode'}),
    ], system_metadata={'Authors': 'aeqt'})
    f = litertlm.LiteRTLMFile(path)
    assert f.version == (litertlm.MAJOR_VERSION, litertlm.MINOR_VERSION,
                         litertlm.PATCH_VERSION)
    assert f.get_system_metadata() == {'Authors': 'aeqt'}
    assert len(f.sections) == 2
    assert f.get_section_metadata(0) == {'model_type': 'tokenizer',
                                         'vocab': 32000}
    assert f.get_model_type(1) == 'tf_lite_prefill_decode'
    assert f.get_section_buffer(0) == tok
    assert f.get_section_buffer(1) == model
    # Sections are 16 KiB block-aligned.
    for s in f.sections:
      assert s.begin_offset % litertlm.BLOCK_SIZE == 0

  def test_serialize_with_overrides(self, tmp_path):
    p1 = str(tmp_path / 'a.litertlm')
    p2 = str(tmp_path / 'b.litertlm')
    litertlm.write_litertlm(p1, [
        (b'one' * 1000, 1, {'model_type': 'x'}),
        (b'two' * 7000, 3, {'model_type': 'y'}),  # > one block
        (b'three', 1, {}),
    ])
    f = litertlm.LiteRTLMFile(p1)
    # Override the middle section with a non-block-multiple size.
    new = os.urandom(litertlm.BLOCK_SIZE + 123)
    f.serialize(p2, {1: new})
    g = litertlm.LiteRTLMFile(p2)
    assert g.get_section_buffer(0) == b'one' * 1000
    assert g.get_section_buffer(1) == new
    assert g.get_section_buffer(2) == b'three'
    assert g.get_model_type(1) == 'y'
    assert [s.data_type for s in g.sections] == [1, 3, 1]

  def test_bad_magic_raises(self, tmp_path):
    p = tmp_path / 'junk.litertlm'
    p.write_bytes(b'NOTLM---' + b'\x00' * 100)
    with pytest.raises(ValueError, match='not a LiteRT-LM'):
      litertlm.LiteRTLMFile(str(p))

  @pytest.mark.skipif(not os.path.exists(_REF_FIXTURE),
                      reason='reference fixture not available')
  def test_parse_reference_builder_output(self):
    """Files written by the real litert-lm-builder must parse."""
    f = litertlm.LiteRTLMFile(_REF_FIXTURE)
    assert f.get_model_type(0) == 'tf_lite_embedder'
    assert f.sections[0].data_type == litertlm.SECTION_TFLITE_MODEL
    buf = f.get_section_buffer(0)
    assert buf[4:8] == b'TFL3'
    assert 'uuid' in f.get_system_metadata()


class TestQuantizeLitertlm:

  @pytest.fixture(scope='class')
  def lm_path(self, tmp_path_factory):
    path = str(tmp_path_factory.mktemp('lm') / 'model.litertlm')
    litertlm.write_litertlm(path, [
        (b'sp-tokenizer' * 50, litertlm.SECTION_GENERIC_BINARY,
         {'model_type': 'tokenizer'}),
        (_make_tflite_bytes(), litertlm.SECTION_TFLITE_MODEL,
         {'model_type': 'tf_lite_prefill_decode'}),
    ], system_metadata={'Authors': 'test'})
    return path

  def test_quantize_and_reload(self, lm_path, tmp_path):
    from ai_edge_quantizer_tpu.models import bundles
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    out = str(tmp_path / 'q.litertlm')
    mapping = recipe_utils.resolve_recipe_mapping('dynamic_wi8_afp32')
    report = bundles.quantize_litertlm(lm_path, out, mapping)
    assert report == [(1, 'tf_lite_prefill_decode', True)]
    # The tokenizer passes through byte-identically; the model section is
    # now an .aeqg payload with the marker item.
    f = litertlm.LiteRTLMFile(out)
    assert f.get_section_buffer(0) == b'sp-tokenizer' * 50
    assert f.get_section_buffer(1)[:4] == b'AEQG'
    assert f.get_section_metadata(1)['aeqt_format'] == 'aeqg'
    assert f.get_system_metadata() == {'Authors': 'test'}
    # Reload as a Bundle: quantized weights present.
    b = bundles.bundle_from_litertlm(out)
    assert len(b.sections) == 1
    sg = b.sections[0].graph.main_subgraph()
    assert any(t.dtype == 'int8' for t in sg.tensors
               if t.quantization is not None)
    assert b.metadata['passthrough_sections'][0]['model_type'] == 'tokenizer'

  def test_quantized_model_executes(self, lm_path, tmp_path):
    """The quantized section must run and track the float model."""
    from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
    from ai_edge_quantizer_tpu.models import bundles
    from ai_edge_quantizer_tpu.recipe import recipe_utils
    out = str(tmp_path / 'q.litertlm')
    bundles.quantize_litertlm(
        lm_path, out, recipe_utils.resolve_recipe_mapping('dynamic_wi8_afp32'))
    float_b = bundles.bundle_from_litertlm(lm_path)
    quant_b = bundles.bundle_from_litertlm(out)
    fg, qg = float_b.sections[0].graph, quant_b.sections[0].graph
    sig = fg.signatures[0]
    sg = fg.subgraphs[sig.subgraph_index]
    rng = np.random.default_rng(3)
    inputs = {name: rng.standard_normal(
        size=sg.tensors[tid].shape).astype(np.float32)
        for name, tid in sig.inputs.items()}
    f_out = GraphExecutor(fg).signature_runner()(inputs)
    q_out = GraphExecutor(qg).signature_runner()(inputs)
    for k in f_out:
      np.testing.assert_allclose(np.asarray(f_out[k]),
                                 np.asarray(q_out[k]), atol=0.1)

  def test_cli_accepts_litertlm(self, lm_path, tmp_path):
    from ai_edge_quantizer_tpu import cli
    out_dir = str(tmp_path / 'out')
    rc = cli.main(['--model_file', lm_path,
                   '--recipe', 'dynamic_wi8_afp32',
                   '--output_dir', out_dir])
    assert rc == 0
    out = os.path.join(out_dir, 'model.litertlm')
    assert os.path.exists(out)
    f = litertlm.LiteRTLMFile(out)
    assert f.get_section_buffer(1)[:4] == b'AEQG'

  def test_missing_recipe_leaves_section_float(self, lm_path, tmp_path):
    from ai_edge_quantizer_tpu.models import bundles
    out = str(tmp_path / 'q.litertlm')
    report = bundles.quantize_litertlm(
        lm_path, out, {'some_other_type': []})
    assert report == [(1, 'tf_lite_prefill_decode', False)]
    f = litertlm.LiteRTLMFile(out)
    assert f.get_section_buffer(1)[4:8] == b'TFL3'
