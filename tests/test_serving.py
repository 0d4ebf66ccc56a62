"""Continuous-batching decode server tests (toy quantized decoder, CPU)."""

import numpy as np
import pytest

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.models import gemma
from ai_edge_quantizer_tpu.parallel.batching import DecodeServer


@pytest.fixture(scope='module')
def quantized_serving_graph():
  cfg = gemma.TOY_DECODER
  g = gemma.build_serving_decoder(cfg, batch_slots=4, prefill_len=8)
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
  return cfg, qt.quantize().quantized_model


class TestDecodeServer:

  def test_more_requests_than_slots(self, quantized_serving_graph):
    cfg, graph = quantized_serving_graph
    srv = DecodeServer(graph, cfg, batch_slots=4)
    rng = np.random.default_rng(0)
    reqs = {}
    for _ in range(7):  # 7 requests, 4 slots: continuous re-admission
      prompt = rng.integers(0, cfg.vocab_size, size=5)
      rid = srv.submit(prompt, max_new_tokens=4)
      reqs[rid] = prompt
    emitted = {rid: [] for rid in reqs}
    for _ in range(50):
      if not srv.has_work():
        break
      for rid, tok in srv.step().items():
        emitted[rid].append(tok)
    assert not srv.has_work()
    # Every request generated tokens (prefill emits the first, decode the
    # rest).
    for rid, toks in emitted.items():
      assert len(toks) == 3, (rid, toks)  # 4 total: 1 at prefill + 3 decode

  def test_greedy_determinism_vs_isolated_decode(self, quantized_serving_graph):
    """A request decoded inside a busy batch must produce the same tokens
    as the same request decoded alone (batch independence)."""
    cfg, graph = quantized_serving_graph
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=6)

    def run(prompts):
      srv = DecodeServer(graph, cfg, batch_slots=4)
      ids = [srv.submit(p, max_new_tokens=5) for p in prompts]
      srv.run_to_completion(200)
      return ids

    srv_alone = DecodeServer(graph, cfg, batch_slots=4)
    rid_alone = srv_alone.submit(prompt, max_new_tokens=5)
    collected_alone = []
    while srv_alone.has_work():
      collected_alone.extend(srv_alone.step().values())

    srv_busy = DecodeServer(graph, cfg, batch_slots=4)
    other = [rng.integers(0, cfg.vocab_size, size=4) for _ in range(3)]
    rid_busy = srv_busy.submit(prompt, max_new_tokens=5)
    for p in other:
      srv_busy.submit(p, max_new_tokens=5)
    busy_tokens = []
    while srv_busy.has_work():
      out = srv_busy.step()
      if rid_busy in out:
        busy_tokens.append(out[rid_busy])
    assert busy_tokens == collected_alone


class TestServerInt8KvAndMetrics:

  def test_int8_cache_serving(self):
    cfg = gemma.TOY_DECODER
    g = gemma.build_serving_decoder(cfg, batch_slots=2, prefill_len=8)
    gemma.stamp_int8_kv_cache(g)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    qg = qt.quantize().quantized_model
    srv = DecodeServer(qg, cfg, batch_slots=2)
    rng = np.random.default_rng(1)
    for _ in range(3):
      srv.submit(rng.integers(0, cfg.vocab_size, size=4), max_new_tokens=3)
    srv.run_to_completion(100)
    assert not srv.has_work()
    assert srv.metrics['requests_completed'] == 3
    assert srv.metrics['tokens_generated'] >= 9
    assert srv.metrics['prefills'] == 3


class TestSamplers:

  def test_topk_topp_generate(self, quantized_serving_graph):
    from ai_edge_quantizer_tpu.parallel.batching import (
        make_topk_sampler, make_topp_sampler)
    cfg, graph = quantized_serving_graph
    for sampler in (make_topk_sampler(k=8, temperature=0.8, seed=1),
                    make_topp_sampler(p=0.9, seed=2)):
      srv = DecodeServer(graph, cfg, batch_slots=4, sample_fn=sampler)
      srv.submit(np.arange(4) % cfg.vocab_size, max_new_tokens=4)
      srv.run_to_completion(50)
      assert srv.metrics['tokens_generated'] >= 4


class TestServingRobustness:

  _graph_cache = {}

  def _server(self, **kw):
    cfg = gemma.TOY_DECODER
    if 'g' not in self._graph_cache:
      self._graph_cache['g'] = gemma.build_serving_decoder(
          cfg, batch_slots=2, prefill_len=8)
    return DecodeServer(self._graph_cache['g'], cfg, batch_slots=2,
                        **kw), cfg

  def test_cancel_queued_and_running(self):
    srv, _ = self._server()
    r1 = srv.submit([1, 2, 3], max_new_tokens=64)
    r2 = srv.submit([4, 5], max_new_tokens=64)
    r3 = srv.submit([6], max_new_tokens=64)   # waits in queue (2 slots)
    srv.step()
    assert srv.cancel(r3)          # still queued
    assert srv.cancel(r1)          # running in a slot
    assert not srv.cancel(999)     # unknown id
    assert srv.stats()['requests_cancelled'] == 2
    srv.step()
    assert srv.stats()['slots_active'] == 1  # only r2 remains

  def test_request_timeout(self):
    srv, _ = self._server()
    srv.submit([1, 2], max_new_tokens=1000, timeout_s=0.0)
    srv.step()   # _expire runs before admit/decode
    s = srv.stats()
    assert s['requests_timeout'] >= 1
    assert s['slots_active'] == 0

  def test_eos_stops_generation(self):
    # Find what the greedy sampler emits first, then make that token EOS.
    srv, _ = self._server()
    rid = srv.submit([3, 1, 4], max_new_tokens=8)
    first = srv.step()
    eos = next(iter(first.values()))
    srv2, _ = self._server(eos_token_id=eos)
    srv2.submit([3, 1, 4], max_new_tokens=1000)
    srv2.run_to_completion(max_ticks=50)
    s = srv2.stats()
    assert s['requests_completed'] == 1
    assert s['tokens_generated'] < 1000

  def test_latency_metrics(self):
    srv, _ = self._server()
    srv.submit([1, 2, 3], max_new_tokens=3)
    srv.run_to_completion(max_ticks=20)
    s = srv.stats()
    assert s['mean_ttft_s'] > 0
    assert s['mean_request_latency_s'] >= s['mean_ttft_s']
    assert s['queue_depth'] == 0 and s['slots_active'] == 0


def test_server_with_packed_weights(quantized_serving_graph):
  cfg, graph = quantized_serving_graph
  srv = DecodeServer(graph, cfg, batch_slots=4, pack_weights=True)
  # Toy weights are below the default packing threshold -> no packing,
  # but the flag path must be safe end to end.
  rid = srv.submit([1, 2, 3], max_new_tokens=3)
  srv.run_to_completion(max_ticks=10)
  assert srv.stats()['requests_completed'] == 1


def test_device_masks_match_host_masks(quantized_serving_graph):
  """Serving with in-graph mask derivation must emit identical tokens."""
  cfg, _ = quantized_serving_graph
  from ai_edge_quantizer_tpu import Quantizer as _Q

  def build(device_masks):
    g = gemma.build_serving_decoder(cfg, batch_slots=2, prefill_len=8,
                                    device_masks=device_masks)
    qt = _Q(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    return qt.quantize().quantized_model

  prompts = [np.array([5, 9, 2]), np.array([7, 1, 3, 8])]

  def run(graph):
    srv = DecodeServer(graph, cfg, batch_slots=2)
    ids = [srv.submit(p, max_new_tokens=5) for p in prompts]
    toks = {i: [] for i in ids}
    for _ in range(12):
      for rid, t in srv.step().items():
        toks[rid].append(t)
      if not srv.has_work():
        break
    return [toks[i] for i in ids]

  host = run(build(False))
  dev = run(build(True))
  assert host == dev, (host, dev)


class TestChunkedPrefill:
  """Prompts longer than the prefill window must prefill losslessly."""

  def _build(self, prefill_len):
    cfg = gemma.TOY_DECODER
    g = gemma.build_serving_decoder(cfg, batch_slots=2,
                                    prefill_len=prefill_len)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    return cfg, qt.quantize().quantized_model

  def _generate(self, cfg, graph, prompt, n=6):
    srv = DecodeServer(graph, cfg, batch_slots=2)
    rid = srv.submit(prompt, max_new_tokens=n)
    toks = []
    for _ in range(n + 2):
      out = srv.step()
      if rid in out:
        toks.append(out[rid])
      if not srv.has_work():
        break
    return toks

  def test_chunked_matches_one_shot(self):
    rng = np.random.default_rng(7)
    cfg, g_chunked = self._build(prefill_len=8)
    _, g_oneshot = self._build(prefill_len=32)
    prompt = rng.integers(0, cfg.vocab_size, size=20)  # 3 chunks of 8
    chunked = self._generate(cfg, g_chunked, prompt)
    oneshot = self._generate(cfg, g_oneshot, prompt)
    assert chunked == oneshot, (chunked, oneshot)

  def test_exact_multiple_chunks(self):
    rng = np.random.default_rng(8)
    cfg, g_chunked = self._build(prefill_len=8)
    _, g_oneshot = self._build(prefill_len=16)
    prompt = rng.integers(0, cfg.vocab_size, size=16)  # exactly 2 chunks
    assert self._generate(cfg, g_chunked, prompt) == self._generate(
        cfg, g_oneshot, prompt)

  def test_overlong_prompt_rejected(self):
    cfg, g = self._build(prefill_len=8)
    srv = DecodeServer(g, cfg, batch_slots=2)
    with pytest.raises(ValueError, match='exceeds the maximum admissible'):
      srv.submit(np.zeros(cfg.max_seq_len + 1, np.int32))


def test_cache_buckets_equivalent_tokens(quantized_serving_graph):
  """Bucketed decode must emit exactly the tokens of the full-cache path
  while switching programs as the context grows."""
  cfg, _ = quantized_serving_graph
  from ai_edge_quantizer_tpu import Quantizer as _Q

  def build(buckets):
    g = gemma.build_serving_decoder(cfg, batch_slots=2, prefill_len=8,
                                    cache_buckets=buckets)
    qt = _Q(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    return qt.quantize().quantized_model

  prompts = [np.array([5, 9, 2, 11, 4]), np.array([7, 1, 3])]

  def run(graph, buckets):
    srv = DecodeServer(graph, cfg, batch_slots=2)
    if buckets:
      assert srv._buckets == [16, 32, 64]
    ids = [srv.submit(p, max_new_tokens=20) for p in prompts]
    toks = {i: [] for i in ids}
    for _ in range(40):
      for rid, t in srv.step().items():
        toks[rid].append(t)
      if not srv.has_work():
        break
    return [toks[i] for i in ids], srv.stats()

  full, _ = run(build(None), None)
  bucketed, stats = run(build((16, 32)), (16, 32))
  assert full == bucketed, (full, bucketed)
  # Generation runs past position 16 -> at least one growth switch.
  assert stats['bucket_switches'] >= 1, stats


def test_device_greedy_matches_host_greedy(quantized_serving_graph):
  """A serving graph built with greedy_head=True makes the server sample
  on device (fetching [B,1] ids, not [B,1,vocab] logits); tokens must
  match the host-greedy twin exactly."""
  cfg, host_graph = quantized_serving_graph
  g = gemma.build_serving_decoder(cfg, batch_slots=4, prefill_len=8,
                                  greedy_head=True)
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
  dev_graph = qt.quantize().quantized_model

  rng = np.random.default_rng(3)
  prompts = [rng.integers(0, cfg.vocab_size, size=5) for _ in range(3)]

  def run(graph, expect_device):
    srv = DecodeServer(graph, cfg, batch_slots=4)
    assert srv._device_greedy is expect_device
    out = {}
    for p in prompts:
      out[srv.submit(p, max_new_tokens=4)] = []
    while srv.has_work():
      for rid, tok in srv.step().items():
        out[rid].append(tok)
    return list(out.values())

  assert run(dev_graph, True) == run(host_graph, False)


def test_device_greedy_disabled_with_custom_sampler(quantized_serving_graph):
  """greedy_head graphs cannot serve a custom sampler (no logits output):
  the server must refuse rather than silently ignore sample_fn."""
  cfg, _ = quantized_serving_graph
  g = gemma.build_serving_decoder(cfg, batch_slots=4, prefill_len=8,
                                  greedy_head=True)
  from ai_edge_quantizer_tpu.parallel import batching
  with pytest.raises(ValueError, match='greedy'):
    DecodeServer(g, cfg, batch_slots=4,
                 sample_fn=batching.make_topk_sampler(5))


def test_step_chunk_matches_plain_steps(quantized_serving_graph):
  """n on-device chunked ticks emit exactly the tokens n plain ticks
  would (greedy device graph; surplus tokens past a request's budget are
  discarded)."""
  cfg, _ = quantized_serving_graph
  g = gemma.build_serving_decoder(cfg, batch_slots=4, prefill_len=8,
                                  greedy_head=True, device_masks=True)
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
  graph = qt.quantize().quantized_model

  rng = np.random.default_rng(7)
  prompts = [rng.integers(0, cfg.vocab_size, size=5) for _ in range(6)]

  def run(chunked):
    srv = DecodeServer(graph, cfg, batch_slots=4)
    assert srv._device_greedy
    out = {}
    for p in prompts:
      out[srv.submit(p, max_new_tokens=7)] = []
    # Prefill's first token lands in request.generated, not step output.
    while srv.has_work():
      if chunked:
        for rid, toks in srv.step_chunk(3).items():
          out[rid].extend(toks)
      else:
        for rid, tok in srv.step().items():
          out[rid].append(tok)
    return out

  a, b = run(True), run(False)
  assert a == b


class TestBatchedPrefill:
  """prefill_batch>1 admission: groups of requests prefill in one pass and
  must emit exactly the tokens the one-request-at-a-time path emits."""

  def _build(self, **kw):
    cfg = gemma.TOY_DECODER
    g = gemma.build_serving_decoder(cfg, batch_slots=4, prefill_len=8, **kw)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    return cfg, qt.quantize().quantized_model

  def _run(self, cfg, graph, prompts, n=5):
    srv = DecodeServer(graph, cfg, batch_slots=4)
    out = {}
    for p in prompts:
      out[srv.submit(p, max_new_tokens=n)] = []
    while srv.has_work():
      for rid, tok in srv.step().items():
        out[rid].append(tok)
    return list(out.values()), srv

  def test_batched_matches_serial(self):
    rng = np.random.default_rng(11)
    # Mixed lengths spanning 1- and 2-chunk groups (prefill window 8).
    prompts = [rng.integers(0, gemma.TOY_DECODER.vocab_size, size=s)
               for s in (3, 8, 13, 5)]
    cfg, g1 = self._build()
    cfg, g3 = self._build(prefill_batch=3)
    serial, _ = self._run(cfg, g1, prompts)
    batched, srv = self._run(cfg, g3, prompts)
    assert srv._prefill_batch == 3
    assert serial == batched, (serial, batched)
    # Per-request TTFT samples were recorded for every admission.
    assert len(srv.ttft_log) == len(prompts)

  def test_prefill_device_masks_match_host(self):
    rng = np.random.default_rng(12)
    prompts = [rng.integers(0, gemma.TOY_DECODER.vocab_size, size=s)
               for s in (4, 11, 8)]
    cfg, g_host = self._build(prefill_batch=2)
    cfg, g_dev = self._build(prefill_batch=2, prefill_device_masks=True)
    host, _ = self._run(cfg, g_host, prompts)
    dev, srv = self._run(cfg, g_dev, prompts)
    assert srv._prefill_device_masks
    assert host == dev, (host, dev)

  def test_prefill_greedy_matches_host_greedy(self):
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, gemma.TOY_DECODER.vocab_size, size=s)
               for s in (6, 9)]
    cfg, g_host = self._build(prefill_batch=2, prefill_device_masks=True)
    cfg, g_dev = self._build(prefill_batch=2, prefill_device_masks=True,
                             prefill_greedy=True)
    host, _ = self._run(cfg, g_host, prompts)
    dev, srv = self._run(cfg, g_dev, prompts)
    assert srv._prefill_greedy
    assert host == dev, (host, dev)

  def test_prefill_greedy_refuses_custom_sampler(self):
    from ai_edge_quantizer_tpu.parallel import batching
    cfg, g = self._build(prefill_greedy=True)
    with pytest.raises(ValueError, match='prefill_greedy'):
      DecodeServer(g, cfg, batch_slots=4,
                   sample_fn=batching.make_topk_sampler(5))

  def test_fused_projections_share_weights_across_signatures(self):
    """Prefill and decode must alias ONE fused weight set (a serving graph
    whose prefill holds separate unfused weights is a different model)."""
    cfg = gemma.TOY_DECODER
    g = gemma.build_serving_decoder(cfg, batch_slots=2, prefill_len=8,
                                    fused_projections=True)
    names = {t.name for sg in g.subgraphs for t in sg.tensors}
    assert any('attn/qkv/w' in n and n.startswith('prefill') for n in names)
    assert not any('attn/q/w' in n for n in names)


def test_prefill_head_cols_tokens_identical():
  """prefill_head_cols=True (head on ONE gathered row per request instead
  of all T positions) must emit bit-identical tokens to the full-T head,
  including multi-chunk prompts (models/gemma.py head_cols gather)."""
  import numpy as np
  from ai_edge_quantizer_tpu.models import gemma
  from ai_edge_quantizer_tpu.parallel import batching

  cfg = gemma.TOY_DECODER
  outs = {}
  for hc in (False, True):
    g = gemma.build_serving_decoder(
        cfg, batch_slots=4, prefill_len=8, materialize_weights=True,
        device_masks=True, fused_projections=True, greedy_head=True,
        prefill_batch=2, prefill_device_masks=True, prefill_greedy=True,
        prefill_head_cols=hc)
    gemma.stamp_int8_kv_cache(g)
    server = batching.DecodeServer(g, cfg, batch_slots=4)
    rng = np.random.default_rng(1)
    for plen in (3, 8, 13):  # 13 spans two prefill chunks
      server.submit(rng.integers(1, cfg.vocab_size, plen).astype(np.int32),
                    max_new_tokens=5)
    reqs = list(server._queue)
    server.run_to_completion()
    outs[hc] = [list(r.generated) for r in reqs]
  assert outs[False] == outs[True], outs


def test_serving_int4_group_kv_pool_matches_int8():
  """The continuous-batching server with an int4-per-group KV pool
  (kv_int4_group serving graphs: INT4G_ATTENTION_SCATTER + quantizing
  slot writer) emits the same tokens as the int8 pool at toy scale,
  through both per-tick and chunked-scan paths."""
  import numpy as np
  from ai_edge_quantizer_tpu.models import gemma
  from ai_edge_quantizer_tpu.parallel import batching

  cfg = gemma.TOY_DECODER
  outs = {}
  for kvg, chunked in ((0, False), (16, False), (16, True)):
    g = gemma.build_serving_decoder(
        cfg, batch_slots=4, prefill_len=8, materialize_weights=True,
        device_masks=True, fused_projections=True, greedy_head=True,
        prefill_batch=2, prefill_device_masks=True, prefill_greedy=True,
        prefill_head_cols=True, kv_int4_group=kvg)
    if not kvg:
      gemma.stamp_int8_kv_cache(g)
    server = batching.DecodeServer(g, cfg, batch_slots=4)
    rng = np.random.default_rng(1)
    for plen in (3, 8, 13):  # incl. a multi-chunk prompt
      server.submit(rng.integers(1, cfg.vocab_size, plen).astype(np.int32),
                    max_new_tokens=6)
    reqs = list(server._queue)
    if chunked:
      while server.has_work():
        server.step_chunk(4)
    else:
      server.run_to_completion()
    outs[(kvg, chunked)] = [list(r.generated) for r in reqs]
  assert outs[(16, False)] == outs[(0, False)], outs
  assert outs[(16, True)] == outs[(0, False)], outs


def test_prefill_tail_chunks_token_identical():
  """prefill_tail_len: short tail program for final partial chunks (cuts
  chunk-padding waste) must emit identical tokens across tail-only,
  exact-tail, full-chunk, full+tail, padded, and multi-chunk+tail
  prompts (models/gemma.py prefill_tail_len; batching plan grouping)."""
  import numpy as np
  from ai_edge_quantizer_tpu.models import gemma
  from ai_edge_quantizer_tpu.parallel import batching

  cfg = gemma.TOY_DECODER
  outs = {}
  for tail in (0, 4):
    g = gemma.build_serving_decoder(
        cfg, batch_slots=4, prefill_len=8, materialize_weights=True,
        device_masks=True, fused_projections=True, greedy_head=True,
        prefill_batch=2, prefill_device_masks=True, prefill_greedy=True,
        prefill_head_cols=True, prefill_tail_len=tail)
    gemma.stamp_int8_kv_cache(g)
    server = batching.DecodeServer(g, cfg, batch_slots=4)
    rng = np.random.default_rng(1)
    for plen in (3, 4, 8, 11, 13, 20):
      server.submit(rng.integers(1, cfg.vocab_size, plen).astype(np.int32),
                    max_new_tokens=5)
    reqs = list(server._queue)
    server.run_to_completion()
    outs[tail] = [list(r.generated) for r in reqs]
  assert outs[0] == outs[4], outs
