"""int8 KV-cache quantization: DUS same-as-output scales + cross-signature
(prefill/decode) QSV alignment — the GenAI cache-quantization flow."""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.models import gemma
from ai_edge_quantizer_tpu.utils import calibration_utils


def _calib_data(cfg, batch, prefill_len, n=4):
  rng = np.random.default_rng(0)
  data = {'prefill': [], 'decode': []}
  for _ in range(n):
    pi = gemma.make_inputs(cfg, 'prefill', batch, prefill_len, start_pos=0,
                           seed=int(rng.integers(1 << 30)))
    data['prefill'].append(pi)
    di = gemma.make_inputs(cfg, 'decode', batch, 1, start_pos=prefill_len,
                           seed=int(rng.integers(1 << 30)))
    # Decode sees a warm cache: reuse random cache contents.
    for k in di:
      if 'cache_in' in k:
        di[k] = rng.standard_normal(di[k].shape).astype(np.float32) * 0.3
    data['decode'].append(di)
  return data


@pytest.fixture(scope='module')
def int8_cache_model():
  cfg = gemma.TOY_DECODER
  g = gemma.build_decoder(cfg, batch=1, prefill_len=8)
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 8)
  # int8 static quantization scoped to the KV-cache update ops only.
  qt.add_static_config('.*cache_new.*', 'DYNAMIC_UPDATE_SLICE', 8, 8)
  assert qt.need_calibration
  qsvs = qt.calibrate(_calib_data(cfg, 1, 8))
  # Align cache ranges across prefill and decode programs.
  align = calibration_utils.CalibrationQsvAlignmentUtils(g)
  for li in range(cfg.num_layers):
    for kind in ('k', 'v'):
      align.align_quant_stats(qsvs, [
          ('prefill', f'layer_{li}_{kind}_cache'),
          ('decode', f'layer_{li}_{kind}_cache'),
          ('decode', f'layer_{li}_{kind}_cache_in'),
      ])
  res = qt.quantize(qsvs)
  return cfg, g, res.quantized_model, qt


class TestInt8KvCache:

  def test_cache_tensors_are_int8(self, int8_cache_model):
    cfg, _, qg, _ = int8_cache_model
    for sig_key in ('prefill', 'decode'):
      sg = qg.subgraph_for_signature(sig_key)
      t = sg.tensor_by_name(f'{sig_key}/layer_0/k_cache_new')
      assert t.dtype == 'int8', (sig_key, t.dtype)
      assert t.quantization is not None

  def test_prefill_decode_cache_scales_match(self, int8_cache_model):
    cfg, _, qg, _ = int8_cache_model
    pre = qg.subgraph_for_signature('prefill').tensor_by_name(
        'prefill/layer_0/k_cache_new')
    dec = qg.subgraph_for_signature('decode').tensor_by_name(
        'decode/layer_0/k_cache_new')
    np.testing.assert_allclose(np.asarray(pre.quantization.scale),
                               np.asarray(dec.quantization.scale))

  def test_quantized_pipeline_still_generates(self, int8_cache_model):
    cfg, g, qg, _ = int8_cache_model
    ex = GraphExecutor(qg)
    fex = GraphExecutor(g)
    pin = gemma.make_inputs(cfg, 'prefill', 1, 8, start_pos=0, seed=3)
    qout = ex.signature_runner('prefill')(pin)
    fout = fex.signature_runner('prefill')(pin)
    ql = np.asarray(qout['logits'])
    fl = np.asarray(fout['logits'])
    corr = np.corrcoef(ql.ravel(), fl.ravel())[0, 1]
    assert corr > 0.98, corr


class TestFusedAttentionIntegration:

  def test_fusion_detected_and_numerically_equal(self, int8_cache_model):
    cfg, _, qg, _ = int8_cache_model
    ex = GraphExecutor(qg)
    # One fused chain per layer per signature.
    assert len(ex._attn_fusions) == 2 * cfg.num_layers
    rng = np.random.default_rng(3)
    inp = gemma.make_inputs(cfg, 'decode', 1, 1, start_pos=8, seed=11)
    for k in inp:
      if 'cache_in' in k:
        inp[k] = rng.standard_normal(inp[k].shape).astype(np.float32) * 0.3
    fused = ex.signature_runner('decode')(inp)
    plain = GraphExecutor(qg, use_fused_kernels=False).signature_runner(
        'decode')(inp)
    lf = np.asarray(fused['logits'])
    lp = np.asarray(plain['logits'])
    assert np.corrcoef(lf.ravel(), lp.ravel())[0, 1] > 0.9999


def test_int4_group_kv_graph_matches_float():
  """kv_int4_group decode graphs (INT4G_ATTENTION custom op: packed uint8
  caches + bf16 per-group sidecar) must track the float-cache graph's
  decode trajectory (models/gemma.py kv_int4_group; ops/impl.py)."""
  import functools
  import numpy as np
  import jax.numpy as jnp
  from ai_edge_quantizer_tpu.execution import executor as executor_lib
  from ai_edge_quantizer_tpu.models import gemma

  cfg = gemma.TOY_DECODER
  B = 2
  logits_by_mode = {}
  for mode in ('float', 'int4g'):
    g = gemma.build_decoder(
        cfg, batch=B, prefill_len=4, signatures=('decode',),
        materialize_weights=True, seed=3,
        kv_int4_group=(16 if mode == 'int4g' else 0))
    ex = executor_lib.GraphExecutor(g)
    sig = g.signature_by_key('decode')
    run = functools.partial(
        ex._run_signature, sig.subgraph_index, 'decode', False)
    S, H, NK = cfg.max_seq_len, cfg.head_dim, cfg.num_kv_heads
    G = cfg.num_query_heads // NK
    caches = {}
    for li in range(cfg.num_layers):
      if mode == 'int4g':
        caches[f'layer_{li}_k_cache_in'] = jnp.zeros((B, NK, S, H // 2),
                                                     jnp.uint8)
        caches[f'layer_{li}_v_cache_in'] = jnp.zeros((B, NK, S, H // 2),
                                                     jnp.uint8)
        caches[f'layer_{li}_s_cache_in'] = jnp.zeros(
            (B, NK, 3 * (H // 16), S), jnp.bfloat16)
      else:
        caches[f'layer_{li}_k_cache_in'] = jnp.zeros((B, NK, S, H),
                                                     jnp.float32)
        caches[f'layer_{li}_v_cache_in'] = jnp.zeros((B, NK, S, H),
                                                     jnp.float32)
    tokens = jnp.array([[7], [13]], jnp.int32)
    rows = []
    kinds = ('k', 'v', 's') if mode == 'int4g' else ('k', 'v')
    for pos in range(4):
      iota = jnp.arange(S)
      mask = jnp.where(iota[None, None, None, :] <= pos, 0.0, -1e9)
      inp = {
          'tokens': tokens,
          'positions': jnp.full((B, 1), pos, jnp.int32),
          'mask': jnp.broadcast_to(mask, (B, 1, G, S)).astype(jnp.float32),
          'cache_pos': jnp.array([0, 0, pos, 0], jnp.int32),
      }
      inp.update(caches)
      out = run(ex._weights, inp)
      caches = {f'layer_{li}_{kd}_cache_in': out[f'layer_{li}_{kd}_cache']
                for li in range(cfg.num_layers) for kd in kinds}
      logits = np.asarray(out['logits'][:, -1, :])
      tokens = jnp.asarray(np.argmax(logits, -1)[:, None].astype(np.int32))
      rows.append(logits)
    logits_by_mode[mode] = np.stack(rows)
  diff = np.abs(logits_by_mode['float'] - logits_by_mode['int4g']).max()
  assert diff < 5e-2, diff
  assert (np.argmax(logits_by_mode['float'], -1)
          == np.argmax(logits_by_mode['int4g'], -1)).all()
