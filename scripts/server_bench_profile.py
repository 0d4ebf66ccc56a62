"""Segment profile of the serving stack on the live backend.

Breaks one admission wave + decode into timed segments so the serving
bench's wall time is attributable: prefill pass (warm), slot write,
first-token fetch, decode chunk, and a full 64-request admission wave.

Run: python scripts/server_bench_profile.py   (TPU; ~3 min with compiles)
Env: AEQT_SRVPROF_CFG=toy for a CPU-fast sanity run.
"""

import os
import sys
import time

import jax

if os.environ.get('JAX_PLATFORMS'):
  jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

os.environ.setdefault('AEQT_INT4_DRQ', '1')
os.environ.setdefault('AEQT_ATTN_LENGTHS', '1')

from ai_edge_quantizer_tpu.models import gemma  # noqa: E402
from ai_edge_quantizer_tpu.parallel import batching  # noqa: E402


def main():
  toy = os.environ.get('AEQT_SRVPROF_CFG') == 'toy'
  cfg = gemma.TOY_DECODER if toy else gemma.GEMMA_2B_LITE
  slots = 8 if toy else int(os.environ.get('AEQT_BENCH_SLOTS', '64'))
  prefill_len = 8 if toy else 128
  prefill_batch = 2 if toy else 8
  on_tpu = jax.default_backend() == 'tpu'

  t0 = time.perf_counter()
  graph = gemma.build_serving_decoder(
      cfg, batch_slots=slots, prefill_len=prefill_len,
      materialize_weights=False, device_masks=True, fused_projections=True,
      greedy_head=True, prefill_batch=prefill_batch,
      prefill_device_masks=True, prefill_greedy=True,
      prefill_head_cols=True)
  gemma.stamp_int8_kv_cache(graph)
  weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                               embedding_bits=8)
  jax.block_until_ready(list(weights.values()))
  print(f'build+weights: {time.perf_counter()-t0:.1f}s')

  server = batching.DecodeServer(
      graph, cfg, batch_slots=slots, weights=weights, pack_weights=on_tpu,
      activation_dtype='bfloat16' if on_tpu else 'float32')
  rng = np.random.default_rng(0)

  def seg(label, fn, reps=1):
    t = time.perf_counter()
    for _ in range(reps):
      out = fn()
    if out is not None:
      jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / reps
    print(f'{label}: {dt*1e3:.1f} ms')
    return dt

  # --- compile warmup -------------------------------------------------
  t0 = time.perf_counter()
  for _ in range(2):
    server.submit(rng.integers(1, cfg.vocab_size, prefill_len // 2),
                  max_new_tokens=2)
  server.run_to_completion()
  print(f'warmup submit+complete (compiles): {time.perf_counter()-t0:.1f}s')
  t0 = time.perf_counter()
  server.submit(rng.integers(1, cfg.vocab_size, 4), max_new_tokens=9)
  while server.has_work():
    server.step_chunk(8)
  print(f'chunk warmup (scan compile): {time.perf_counter()-t0:.1f}s')

  # --- warm segments ---------------------------------------------------
  T, Bp = server._prefill_len, server._prefill_batch
  inputs = {
      'tokens': np.ones((Bp, T), np.int32),
      'positions': np.broadcast_to(np.arange(T, dtype=np.int32),
                                   (Bp, T)).copy(),
      'cache_pos': np.array([0, 0, 0, 0], np.int32),
  }
  if server.graph.metadata.get('prefill_head_cols'):
    inputs['head_cols'] = np.full((Bp, 1), T - 1, np.int32)
  if not server._prefill_device_masks:
    inputs['mask'] = server._host_prefill_mask([], 0)
  if not hasattr(server, '_prefill_zero_caches'):
    # The single-dispatch chain path materializes zero caches in-graph;
    # build host-side ones for the standalone warm-pass segment, shaped
    # from the PREFILL signature so any KV mode matches (ADVICE r4).
    server._prefill_zero_caches = server.prefill_zero_caches()
  inputs.update(server._prefill_zero_caches)
  w = server._executor._weights

  seg('prefill pass (warm, batch=%d, T=%d)' % (Bp, T),
      lambda: server._prefill_fn(w, inputs), reps=4)

  out = server._prefill_fn(w, inputs)
  rows = {f'layer_{li}_{kind}_cache_in': out[f'layer_{li}_{kind}_cache']
          for li in range(cfg.num_layers) for kind in ('k', 'v')}
  ids = jnp.arange(Bp, dtype=jnp.int32)
  valid = jnp.ones(Bp, bool)

  def write():
    server._caches = server._slot_writer(server._caches, rows, ids, valid)
    return server._caches[next(iter(server._caches))]
  seg('slot write (group)', write, reps=4)

  tok = out['next_tokens'][jnp.arange(Bp), jnp.zeros(Bp, jnp.int32)]
  seg('first-token fetch (device_get)',
      lambda: jax.device_get(tok), reps=4)

  # full admission wave: slots requests, mixed lengths
  max_p = min(server.max_prompt_len(), cfg.max_seq_len - 8)
  lens = [p for p in (32, 64, 128, 256, 512) if p <= max_p] or [max_p]
  for i in range(slots):
    server.submit(rng.integers(1, cfg.vocab_size, lens[i % len(lens)]),
                  max_new_tokens=8)
  t0 = time.perf_counter()
  server._expire()
  server._admit()
  wave = time.perf_counter() - t0
  npre = server.metrics['prefills']
  print(f'admission wave ({slots} reqs, mixed lens {lens}): {wave:.2f}s '
        f'({wave/slots*1e3:.0f} ms/request)')

  t0 = time.perf_counter()
  n_chunks = 0
  while server.has_work():
    server.step_chunk(8)
    n_chunks += 1
  dt = time.perf_counter() - t0
  print(f'decode drain: {dt:.2f}s over {n_chunks} chunk calls '
        f'({dt/max(n_chunks,1)*1e3:.0f} ms/chunk of 8 ticks)')
  print('metrics:', {k: round(v, 3) if isinstance(v, float) else v
                     for k, v in server.metrics.items()})
  del npre


if __name__ == '__main__':
  main()
