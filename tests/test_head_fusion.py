"""Greedy-head fusion: matmul+argmax kernel numerics + executor matching."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ai_edge_quantizer_tpu import Quantizer, qtyping
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.kernels import pallas_head, pallas_qmatmul


def _int8_case(seed, m=16, n=640, k=256):
  rng = np.random.default_rng(seed)
  x = rng.standard_normal((m, k)).astype(np.float32)
  w = rng.integers(-127, 128, size=(n, k)).astype(np.int8)
  scale = (rng.uniform(0.5, 2.0, size=n) * 0.01).astype(np.float32)
  return jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale)


def test_kernel_int8_drq_matches_xla_twin():
  x, w, scale = _int8_case(0)
  got = pallas_head.head_argmax_pallas(
      x, w, scale, packed=False, drq=True, bn=128, interpret=True)
  # XLA twin: identical per-row act quantization + int32 matmul + argmax.
  absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
  xs = jnp.maximum(absmax, 1e-9) / 127.0
  xq = jnp.round(x / xs).astype(jnp.int8)
  acc = jax.lax.dot_general(
      xq, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
  logits = acc.astype(jnp.float32) * xs * scale[None, :]
  want = jnp.argmax(logits, axis=-1).astype(jnp.int32)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_packed_int4_drq_and_padding():
  rng = np.random.default_rng(1)
  m, n, k, true_n = 8, 512, 256, 384
  x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
  w_q = rng.integers(-7, 8, size=(n, k)).astype(np.int8)
  # Padded rows get huge scales: they must NEVER win (masked in-kernel).
  scale = np.full(n, 0.01, np.float32)
  scale[true_n:] = 100.0
  w_packed = pallas_qmatmul.pack_int4_split(jnp.asarray(w_q))
  got = pallas_head.head_argmax_pallas(
      x, w_packed, jnp.asarray(scale), packed=True, true_n=true_n,
      drq=True, bn=128, interpret=True)
  absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
  xs = jnp.maximum(absmax, 1e-9) / 127.0
  xq = jnp.round(x / xs).astype(jnp.int8)
  acc = jax.lax.dot_general(
      xq, jnp.asarray(w_q), (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.int32)
  logits = (acc.astype(jnp.float32) * xs * scale[None, :])[:, :true_n]
  want = jnp.argmax(logits, axis=-1).astype(jnp.int32)
  assert int(jnp.max(got)) < true_n
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_grid_overhang_non_dividing_n():
  # bn does not divide N: the tail block overhangs and must be masked.
  x, w, scale = _int8_case(7, m=8, n=600, k=128)
  got = pallas_head.head_argmax_pallas(
      x, w, scale, packed=False, drq=True, bn=256, interpret=True)
  absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
  xs = jnp.maximum(absmax, 1e-9) / 127.0
  xq = jnp.round(x / xs).astype(jnp.int8)
  acc = jax.lax.dot_general(
      xq, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
  logits = acc.astype(jnp.float32) * xs * scale[None, :]
  want = jnp.argmax(logits, axis=-1).astype(jnp.int32)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_bf16_close_to_float():
  x, w, scale = _int8_case(2, m=8, n=256, k=128)
  got = pallas_head.head_argmax_pallas(
      x.astype(jnp.bfloat16), w, scale, packed=False, drq=False, bn=128,
      interpret=True)
  logits = (x @ w.T.astype(jnp.float32)) * scale[None, :]
  want = jnp.argmax(logits, axis=-1)
  agree = np.mean(np.asarray(got) == np.asarray(want))
  assert agree > 0.9, agree  # bf16 rounding may flip exact ties only


def _head_model(seed=0, d=128, v=640, batch=4, escape_logits=False):
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (batch, d))
  w = b.constant(
      'head/w', (rng.standard_normal((v, d)) * 0.3).astype(np.float32))
  logits = b.op('FULLY_CONNECTED', [x, w, -1], [(batch, v)],
                output_names=['logits'],
                attrs={'fused_activation': 'NONE'})
  ids = b.op('ARG_MAX', [logits], [(batch,)], output_names=['next'],
             attrs={'axis': -1}, output_dtypes=['int32'])
  b.output(ids, user_name='next_tokens')
  if escape_logits:
    b.output(logits, user_name='logits')
  g = b.finalize()
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, num_bits=8)
  return qt.quantize().quantized_model, rng


def test_executor_fusion_matches_unfused(monkeypatch):
  model, rng = _head_model()
  inp = {'x': rng.standard_normal((4, 128)).astype(np.float32)}
  monkeypatch.setenv('AEQT_HEAD_FUSION', '0')
  ex_off = GraphExecutor(model)
  ex_off.prepare_serving_weights(min_weight_params=0)
  assert not ex_off._head_fusions
  want = np.asarray(ex_off.signature_runner()(inp)['next_tokens'])
  monkeypatch.setenv('AEQT_HEAD_FUSION', '1')
  ex_on = GraphExecutor(model)
  ex_on.prepare_serving_weights(min_weight_params=0)
  assert len(ex_on._head_fusions) == 1
  got = np.asarray(ex_on.signature_runner()(inp)['next_tokens'])
  assert got.dtype == np.int32
  # int8 DRQ numerics in and out of the fusion may differ only on exact
  # logit ties; on random data the tokens must agree.
  np.testing.assert_array_equal(got, want)


def test_no_fusion_when_logits_escape(monkeypatch):
  model, _ = _head_model(seed=3, escape_logits=True)
  monkeypatch.setenv('AEQT_HEAD_FUSION', '1')
  ex = GraphExecutor(model)
  ex.prepare_serving_weights(min_weight_params=0)
  assert not ex._head_fusions


def test_capture_all_unrolls(monkeypatch):
  model, rng = _head_model(seed=4)
  inp = {'x': rng.standard_normal((4, 128)).astype(np.float32)}
  monkeypatch.setenv('AEQT_HEAD_FUSION', '1')
  ex = GraphExecutor(model)
  ex.prepare_serving_weights(min_weight_params=0)
  assert ex._head_fusions
  captured = ex.signature_runner(capture_all=True)(inp)
  assert 'logits' in captured
  assert 'next' in captured


def test_gemma_greedy_head_graph(monkeypatch):
  from ai_edge_quantizer_tpu.models import gemma
  cfg = gemma.TOY_DECODER
  graph = gemma.build_decoder(cfg, batch=2, prefill_len=4,
                              signatures=('decode',), greedy_head=True)
  qt = Quantizer(graph)
  qt.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, num_bits=4)
  qt.add_dynamic_config('.*', qtyping.OpName.EMBEDDING_LOOKUP, num_bits=8)
  quantized = qt.quantize().quantized_model
  monkeypatch.setenv('AEQT_HEAD_FUSION', '1')
  ex = GraphExecutor(quantized)
  ex.prepare_serving_weights(min_weight_params=0)
  assert ex._head_fusions, 'greedy head did not fuse on the gemma graph'
  inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=2)
  out = ex.signature_runner('decode')(inputs)
  toks = np.asarray(out['next_tokens'])
  assert toks.shape == (2, 1)
  assert toks.dtype == np.int32
  assert (toks >= 0).all() and (toks < cfg.vocab_size).all()
