"""Executor GeGLU MLP fusion: chain matching + megakernel numerics."""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import Quantizer, qtyping
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder


D, F, BATCH = 256, 256, 4


def _geglu_model(seed=0, extra_consumer=False):
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (BATCH, D))
  wgu = b.constant(
      'gate_up/w', (rng.standard_normal((2 * F, D)) * 0.1).astype(
          np.float32))
  gu = b.op('FULLY_CONNECTED', [x, wgu, -1], [(BATCH, 2 * F)],
            output_names=['gate_up/out'],
            attrs={'fused_activation': 'NONE'})
  gate = b.op('SLICE', [gu], [(BATCH, F)], output_names=['gate'],
              attrs={'begin': [0, 0]})
  up = b.op('SLICE', [gu], [(BATCH, F)], output_names=['up'],
            attrs={'begin': [0, F]})
  gact = b.op('GELU', [gate], [(BATCH, F)], output_names=['gelu'])
  prod = b.op('MUL', [gact, up], [(BATCH, F)], output_names=['prod'])
  wd = b.constant(
      'down/w', (rng.standard_normal((D, F)) * 0.1).astype(np.float32))
  down = b.op('FULLY_CONNECTED', [prod, wd, -1], [(BATCH, D)],
              output_names=['down/out'],
              attrs={'fused_activation': 'NONE'})
  b.output(down)
  if extra_consumer:
    # gate feeds a second op -> chain must NOT fuse
    extra = b.op('RSQRT', [gate], [(BATCH, F)], output_names=['extra'])
    b.output(extra)
  g = b.finalize()
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, num_bits=4)
  return qt.quantize().quantized_model, rng


def _prep(model, monkeypatch, fuse, bf=128):
  monkeypatch.setenv('AEQT_MLP_FUSION', '1' if fuse else '0')
  monkeypatch.setenv('AEQT_MLP_BF', str(bf))
  ex = GraphExecutor(model)
  ex.prepare_serving_weights(min_weight_params=0)
  return ex


def test_fusion_found_and_matches_unfused(monkeypatch):
  model, rng = _geglu_model()
  inp = {'x': rng.standard_normal((BATCH, D)).astype(np.float32)}
  ex_off = _prep(model, monkeypatch, fuse=False)
  want = np.asarray(list(ex_off.signature_runner()(inp).values())[0])
  ex_on = _prep(model, monkeypatch, fuse=True)
  assert len(ex_on._mlp_fusions) == 1
  assert len(ex_on._mlp_skip) == 5  # 2 slices + gelu + mul + down fc
  got = np.asarray(list(ex_on.signature_runner()(inp).values())[0])
  assert got.shape == want.shape
  np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fusion_drq_close(monkeypatch):
  model, rng = _geglu_model(seed=1)
  inp = {'x': rng.standard_normal((BATCH, D)).astype(np.float32)}
  ex_off = _prep(model, monkeypatch, fuse=False)
  want = np.asarray(list(ex_off.signature_runner()(inp).values())[0])
  monkeypatch.setenv('AEQT_INT4_DRQ', '1')
  ex_on = _prep(model, monkeypatch, fuse=True)
  got = np.asarray(list(ex_on.signature_runner()(inp).values())[0])
  err = np.linalg.norm(got - want) / np.linalg.norm(want)
  assert err < 0.03, err


def test_no_fusion_when_intermediate_escapes(monkeypatch):
  model, _ = _geglu_model(seed=2, extra_consumer=True)
  ex = _prep(model, monkeypatch, fuse=True)
  assert not ex._mlp_fusions


def test_capture_all_unrolls_fusion(monkeypatch):
  model, rng = _geglu_model(seed=3)
  inp = {'x': rng.standard_normal((BATCH, D)).astype(np.float32)}
  ex = _prep(model, monkeypatch, fuse=True)
  assert ex._mlp_fusions
  captured = ex.signature_runner(capture_all=True)(inp)
  # Chain intermediates stay validator-visible under capture.
  for name in ('gate', 'up', 'gelu', 'prod', 'down/out'):
    assert name in captured, name


def test_fusion_skipped_when_f_too_small_for_bf(monkeypatch):
  model, _ = _geglu_model(seed=4)
  ex = _prep(model, monkeypatch, fuse=True, bf=256)  # F//bf < 2
  assert not ex._mlp_fusions


def test_norm_fusion_excludes_mlp_chain(monkeypatch):
  """With AEQT_NORM_FUSION=1, a norm-fed chain must not MLP-fuse (the
  megakernel would silently drop the skipped RMS_NORM)."""
  rng = np.random.default_rng(6)
  b = GraphBuilder('main')
  x = b.input('x', (BATCH, D))
  gamma = b.constant('norm/gamma', np.ones(D, np.float32))
  xn = b.op('RMS_NORM', [x, gamma], [(BATCH, D)], output_names=['norm'],
            attrs={'epsilon': 1e-6})
  wgu = b.constant(
      'gate_up/w', (rng.standard_normal((2 * F, D)) * 0.1).astype(
          np.float32))
  gu = b.op('FULLY_CONNECTED', [xn, wgu, -1], [(BATCH, 2 * F)],
            output_names=['gate_up/out'],
            attrs={'fused_activation': 'NONE'})
  gate = b.op('SLICE', [gu], [(BATCH, F)], output_names=['gate'],
              attrs={'begin': [0, 0]})
  up = b.op('SLICE', [gu], [(BATCH, F)], output_names=['up'],
            attrs={'begin': [0, F]})
  gact = b.op('GELU', [gate], [(BATCH, F)], output_names=['gelu'])
  prod = b.op('MUL', [gact, up], [(BATCH, F)], output_names=['prod'])
  wd = b.constant(
      'down/w', (rng.standard_normal((D, F)) * 0.1).astype(np.float32))
  down = b.op('FULLY_CONNECTED', [prod, wd, -1], [(BATCH, D)],
              output_names=['down/out'],
              attrs={'fused_activation': 'NONE'})
  b.output(down)
  qt = Quantizer(b.finalize())
  qt.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, num_bits=4)
  model = qt.quantize().quantized_model
  inp = {'x': rng.standard_normal((BATCH, D)).astype(np.float32)}
  monkeypatch.setenv('AEQT_NORM_FUSION', '0')
  ex_plain = _prep(model, monkeypatch, fuse=False)
  want = np.asarray(list(ex_plain.signature_runner()(inp).values())[0])
  monkeypatch.setenv('AEQT_NORM_FUSION', '1')
  ex = _prep(model, monkeypatch, fuse=True)
  if ex._norm_fusions:
    assert not ex._mlp_fusions
  got = np.asarray(list(ex.signature_runner()(inp).values())[0])
  np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def _split_geglu_model(seed=0):
  """Pattern B: separate gate / up projections on the same input."""
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (BATCH, D))
  wg = b.constant(
      'gate/w', (rng.standard_normal((F, D)) * 0.1).astype(np.float32))
  wu = b.constant(
      'up/w', (rng.standard_normal((F, D)) * 0.1).astype(np.float32))
  gate = b.op('FULLY_CONNECTED', [x, wg, -1], [(BATCH, F)],
              output_names=['gate/out'],
              attrs={'fused_activation': 'NONE'})
  up = b.op('FULLY_CONNECTED', [x, wu, -1], [(BATCH, F)],
            output_names=['up/out'],
            attrs={'fused_activation': 'NONE'})
  gact = b.op('GELU', [gate], [(BATCH, F)], output_names=['gelu'])
  prod = b.op('MUL', [gact, up], [(BATCH, F)], output_names=['prod'])
  wd = b.constant(
      'down/w', (rng.standard_normal((D, F)) * 0.1).astype(np.float32))
  down = b.op('FULLY_CONNECTED', [prod, wd, -1], [(BATCH, D)],
              output_names=['down/out'],
              attrs={'fused_activation': 'NONE'})
  b.output(down)
  g = b.finalize()
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', qtyping.OpName.FULLY_CONNECTED, num_bits=4)
  return qt.quantize().quantized_model, rng


def test_split_projection_fusion_matches_unfused(monkeypatch):
  model, rng = _split_geglu_model()
  inp = {'x': rng.standard_normal((BATCH, D)).astype(np.float32)}
  ex_off = _prep(model, monkeypatch, fuse=False)
  want = np.asarray(list(ex_off.signature_runner()(inp).values())[0])
  ex_on = _prep(model, monkeypatch, fuse=True)
  assert len(ex_on._mlp_fusions) == 1
  info = next(iter(ex_on._mlp_fusions.values()))
  assert 'wgu_split' in info
  assert len(ex_on._mlp_skip) == 4  # other FC + gelu + mul + down fc
  got = np.asarray(list(ex_on.signature_runner()(inp).values())[0])
  np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_split_projection_capture_unrolls(monkeypatch):
  model, rng = _split_geglu_model(seed=5)
  inp = {'x': rng.standard_normal((BATCH, D)).astype(np.float32)}
  ex = _prep(model, monkeypatch, fuse=True)
  assert ex._mlp_fusions
  captured = ex.signature_runner(capture_all=True)(inp)
  for name in ('gate/out', 'up/out', 'gelu', 'prod', 'down/out'):
    assert name in captured, name
