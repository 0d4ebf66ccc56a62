"""Serving-fusion matcher regression guards.

The bench supervisor silently falls back when a kernel fails, so a
matcher regression would be measured as its fallback twin with
plausible numbers (this bit us in round 2: a lengths kernel that never
compiled was 'measured' as the masked kernel). These tests pin the
fusion COUNTS on a real-width Gemma layer stack so any matcher change
that drops a fusion fails loudly.
"""

import dataclasses

import numpy as np
import pytest

from ai_edge_quantizer_tpu.execution import executor as executor_lib
from ai_edge_quantizer_tpu.models import gemma


@pytest.fixture(scope='module')
def serving_executor():
  cfg = dataclasses.replace(gemma.GEMMA_2B_LITE, num_layers=2,
                            max_seq_len=128)
  graph = gemma.build_decoder(cfg, batch=2, prefill_len=8,
                              signatures=('decode',),
                              materialize_weights=False,
                              fused_projections=True, greedy_head=True)
  gemma.stamp_int8_kv_cache(graph)
  weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                               embedding_bits=8)
  ex = executor_lib.GraphExecutor(graph, activation_dtype='bfloat16')
  ex._weights = weights
  ex.prepare_serving_weights(min_weight_params=0)
  return cfg, graph, ex


class TestFusionCounts:

  def test_attention_fusions_one_per_layer(self, serving_executor):
    cfg, _, ex = serving_executor
    assert len(ex._attn_fusions) == cfg.num_layers

  def test_mlp_megakernel_one_per_layer(self, serving_executor):
    cfg, _, ex = serving_executor
    assert len(ex._mlp_fusions) == cfg.num_layers

  def test_greedy_head_fusion_present(self, serving_executor):
    _, _, ex = serving_executor
    assert len(ex._head_fusions) == 1

  def test_packed_int4_weights_cover_all_fcs(self, serving_executor):
    cfg, graph, ex = serving_executor
    # qkv + out-proj per layer (MLP weights live in the grouped form),
    # plus the (greedy-head) logits weight.
    packed_and_grouped = len(ex._packed_int4_keys)
    assert packed_and_grouped >= 2 * cfg.num_layers + 1, (
        packed_and_grouped)

  def test_writeback_matcher_covers_every_layer(self, serving_executor,
                                                monkeypatch):
    """With the gate on, every layer's cache DUS pair must match."""
    monkeypatch.setenv('AEQT_ATTN_WRITEBACK', '1')
    cfg, graph, _ = serving_executor
    ex2 = executor_lib.GraphExecutor(graph, activation_dtype='bfloat16')
    wb = [f for f in ex2._attn_fusions.values() if 'writeback' in f]
    assert len(wb) == cfg.num_layers, (len(wb), cfg.num_layers)

  def test_executes_with_finite_logits(self, serving_executor):
    cfg, graph, ex = serving_executor
    inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=16)
    out = ex.signature_runner('decode')(inputs)
    ids = np.asarray(out['next_tokens'])
    assert ids.shape[0] == 2
    assert (ids >= 0).all() and (ids < cfg.vocab_size).all()
