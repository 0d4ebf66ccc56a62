"""Executor decode-block fusion: matched units must reproduce the
unfused path bit-for-bit at f32 activations on the real decode graph."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_edge_quantizer_tpu.execution import executor as executor_lib
from ai_edge_quantizer_tpu.models import gemma


@pytest.fixture()
def small_decode():
  cfg = dataclasses.replace(
      gemma.GEMMA_2B_LITE, num_layers=3, max_seq_len=128, embed_dim=512,
      ffn_dim=2048, num_query_heads=2, num_kv_heads=1, head_dim=256,
      vocab_size=4096)
  graph = gemma.build_decoder(cfg, batch=8, prefill_len=8,
                              signatures=('decode',),
                              materialize_weights=False,
                              fused_projections=True, greedy_head=True)
  gemma.stamp_int8_kv_cache(graph)
  weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                               embedding_bits=8)
  return cfg, graph, weights


def _run(cfg, graph, weights, block, monkeypatch):
  monkeypatch.setenv('AEQT_INT4_DRQ', '1')
  monkeypatch.setenv('AEQT_ATTN_LENGTHS', '1')
  monkeypatch.setenv('AEQT_ATTN_WRITEBACK', '1')
  monkeypatch.setenv('AEQT_ATTN_WRITEBACK_MODE', 'stale')
  monkeypatch.setenv('AEQT_DECODE_BLOCK', '1' if block else '0')
  ex = executor_lib.GraphExecutor(graph, activation_dtype='float32')
  ex._weights = dict(weights)
  ex.prepare_serving_weights(min_weight_params=0)
  if block:
    assert len(ex._block_fusions) == cfg.num_layers - 1
  inputs = gemma.make_inputs(cfg, 'decode', 8, 1, start_pos=64)
  sig = graph.signature_by_key('decode')
  out = ex._run_signature(sig.subgraph_index, 'decode', False,
                          ex._weights,
                          {k: jnp.asarray(np.asarray(v))
                           for k, v in inputs.items()})
  return {k: np.asarray(v) for k, v in out.items()}


def test_block_fusion_bit_exact_f32(small_decode, monkeypatch):
  cfg, graph, weights = small_decode
  base = _run(cfg, graph, weights, False, monkeypatch)
  fused = _run(cfg, graph, weights, True, monkeypatch)
  assert sorted(base) == sorted(fused)
  for k in sorted(base):
    np.testing.assert_array_equal(fused[k], base[k], err_msg=k)
