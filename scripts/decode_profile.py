"""Decode-step segment profile: where does the step time actually go?

On-device scan timing (the only trustworthy clock through the axon
tunnel): each segment runs ITERS times inside ONE jitted lax.scan, so the
measured wall time is device compute + a single dispatch.

Mirrors bench.py's headline configuration exactly (full vocab, fused
projections, greedy head, int8 KV, packed int4 weights, lengths-based
attention, bf16 activations) and persists a per-phase JSON artifact
(DECODE_PROFILE_r04.json) with ms AND achieved GB/s per segment, the
host-sync cost, and the accounted/residual split — the step-level
decomposition VERDICT r3 item 2 asked for.

Segments at the bench configuration (B, int8 KV, packed int4):
  full        — the whole decode step (chained token/cache dependencies)
  attention   — lengths-masked int8-KV kernel x num_layers (bench kernel)
  fc_sweep    — every FC weight at its true shape/count (packed or XLA)
  cache_dus   — int8 cache DUS updates x num_layers x 2
  host_sync   — one value-fetch round trip through the tunnel

Env: AEQT_PROF_PRESET (gemma2b|gemma2b_lite|toy), AEQT_PROF_BATCH,
AEQT_PROF_ITERS, AEQT_PROF_OUT (artifact path; empty disables).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

# Match the bench's serving-path env before the executor module loads.
os.environ.setdefault('AEQT_INT4_DRQ', '1')
os.environ.setdefault('AEQT_ATTN_LENGTHS', '1')

import jax
if os.environ.get('JAX_PLATFORMS'):
  jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
try:
  cache_dir = os.environ.get('AEQT_XLA_CACHE', '/tmp/aeqt_xla_cache')
  os.makedirs(cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', cache_dir)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:  # noqa: BLE001
  pass
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.execution import executor as executor_lib  # noqa
from ai_edge_quantizer_tpu.models import gemma  # noqa


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  preset = os.environ.get('AEQT_PROF_PRESET', 'gemma2b')
  batch = int(os.environ.get('AEQT_PROF_BATCH', '256'))
  iters = int(os.environ.get('AEQT_PROF_ITERS', '16'))
  cfg = {'toy': gemma.TOY_DECODER, 'gemma2b': gemma.GEMMA_2B,
         'gemma2b_lite': gemma.GEMMA_2B_LITE}[preset]
  on_tpu = jax.default_backend() == 'tpu'
  log(f'profile: {preset} batch={batch} iters={iters} '
      f'backend={jax.default_backend()}')

  graph = gemma.build_decoder(cfg, batch=batch, prefill_len=8,
                              signatures=('decode',),
                              materialize_weights=False,
                              fused_projections=True, greedy_head=True)
  gemma.stamp_int8_kv_cache(graph)
  # Reuse the bench's weight cache when present (same build flags).
  cache_path = f'/tmp/aeqt_bench_weights_{preset}_int8_f1.npz'
  weights = None
  if (os.environ.get('AEQT_BENCH_NO_WEIGHT_CACHE') != '1'
      and os.path.exists(cache_path)):
    try:
      weights = gemma.load_materialized(graph, cache_path)
      log(f'weights from bench cache: {cache_path}')
    except Exception as ce:  # noqa: BLE001
      log(f'bench weight cache unreadable ({ce}); regenerating')
      weights = None
  if weights is None:
    weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                                 embedding_bits=8)
  jax.block_until_ready(list(weights.values()))
  ex = executor_lib.GraphExecutor(graph, activation_dtype='bfloat16')
  ex._weights = weights
  if on_tpu:
    ex.prepare_serving_weights(min_weight_params=0)
  # Drain the packing queue BEFORE any timing: a pending unpack otherwise
  # inflates the first fetches by seconds and corrupts every segment.
  jax.block_until_ready(list(ex._weights.values()))
  log(f'packed FCs: {len(ex._packed_int4_keys)}; '
      f'attn fusions: {len(ex._attn_fusions)}')
  weights = ex._weights
  sig = graph.signature_by_key('decode')
  run_sig = functools.partial(
      ex._run_signature, sig.subgraph_index, 'decode', False)
  # Decode at near-full context like the bench (pays for ~S live rows).
  S = cfg.max_seq_len
  start_pos = int(os.environ.get('AEQT_PROF_START_POS', max(64, S - 128)))
  inputs = gemma.make_inputs(cfg, 'decode', batch, 1, start_pos=start_pos)
  dec_sg = graph.subgraphs[sig.subgraph_index]
  for name, tid in sig.inputs.items():
    # Feed caches pre-quantized: a float cache pool would be gigabytes of
    # pointless f32 on device.
    if name.endswith('_cache_in') and dec_sg.tensors[tid].dtype == 'int8':
      inputs[name] = np.zeros(inputs[name].shape, np.int8)
  inputs = {k: jnp.asarray(np.asarray(v)) if np.asarray(v).nbytes < 16384
            else jnp.zeros(np.asarray(v).shape, np.asarray(v).dtype)
            for k, v in inputs.items()}

  NK, H = cfg.num_kv_heads, cfg.head_dim
  G = cfg.num_query_heads // cfg.num_kv_heads
  L = cfg.num_layers

  results = {}
  seg_bytes = {}

  # -- host sync cost: MIN of several value fetches (robust to queue
  # stragglers; the subtraction below must never exceed real overhead).
  probe = jnp.zeros((8,), jnp.float32)
  for _ in range(2):
    float(jnp.sum(probe))  # warm
  fetches = []
  for _ in range(6):
    t0 = time.perf_counter()
    float(jnp.sum(probe + 1.0))
    fetches.append(time.perf_counter() - t0)
  results['host_sync'] = min(fetches)
  log(f"host sync: {results['host_sync']*1e3:.2f} ms/fetch "
      f"(min of {['%.0f' % (f*1e3) for f in fetches]} ms)")

  # Full step with REAL step-to-step dependencies (cache carry + sampled
  # token feedback), exactly like bench.py's on-device loop. A body whose
  # inputs repeat every iteration gets hoisted out of the scan by XLA and
  # times as a no-op.
  iota_s = jnp.arange(S, dtype=jnp.int32)
  cache_keys = [k for k in inputs if k.endswith('_cache_in')]

  def full_chunk(w, caches, tokens, pos):
    def body(carry, _):
      caches_c, tokens_c, pos_c = carry
      m = jnp.where(iota_s[None, None, None, :] <= pos_c,
                    jnp.float32(0.0), jnp.float32(-1e9))
      inp = {
          'tokens': tokens_c,
          'positions': jnp.full((batch, 1), pos_c, jnp.int32),
          'mask': jnp.broadcast_to(m, (batch, 1, G, S)),
          'cache_pos': jnp.stack(
              [jnp.int32(0), jnp.int32(0), pos_c, jnp.int32(0)]),
      }
      inp.update(caches_c)
      out = run_sig(w, inp)
      new_caches = {k: out[k[:-3]] for k in cache_keys}
      nxt = out['next_tokens'].astype(jnp.int32)
      return (new_caches, nxt, pos_c + 1), None
    (caches, tokens, pos), _ = jax.lax.scan(
        body, (caches, tokens, pos), None, length=iters)
    return tokens

  caches0 = {k: inputs[k] for k in cache_keys}
  tokens0 = inputs['tokens']
  jit_full = jax.jit(full_chunk)
  v = np.asarray(jit_full(weights, caches0, tokens0, jnp.int32(start_pos)))
  t0 = time.perf_counter()
  v = np.asarray(jit_full(weights, caches0, tokens0, jnp.int32(start_pos)))
  results['full'] = ((time.perf_counter() - t0 - results['host_sync'])
                     / iters)
  # .nbytes is metadata — np.asarray here would FETCH gigabytes.
  weight_bytes = sum(int(w.nbytes) for w in weights.values())
  cache_bytes = sum(int(c.nbytes) for c in caches0.values())
  seg_bytes['full'] = weight_bytes + cache_bytes
  log(f"full step (chained): {results['full']*1e3:.3f} ms")

  # -- attention only: the production lengths kernel at bench shapes x L.
  from ai_edge_quantizer_tpu.kernels import pallas_attention
  rngk = np.random.default_rng(0)
  kk = jax.random.PRNGKey(0)
  k1, k2, k3 = jax.random.split(kk, 3)
  # Device-side generation: bulk host->device transfers wedge in the
  # tunnel's degraded phases.
  q = jax.random.normal(k1, (batch, NK, G, H), jnp.float32)
  kq = jax.random.randint(k2, (batch, NK, S, H), -127, 127, jnp.int8)
  vq = jax.random.randint(k3, (batch, NK, S, H), -127, 127, jnp.int8)
  lengths = jnp.full((batch,), start_pos + 1, jnp.int32)

  def attn_all_layers(q_, kq_, vq_, lengths_):
    # Chained: each layer consumes the previous output (reshaped back to
    # the q shape), so nothing is loop-invariant.
    out = q_
    for _ in range(L):
      out = pallas_attention.decode_attention_int8_lengths(
          out, kq_, vq_, 0.06, 0.06, lengths_, interpret=not on_tpu)
    return out

  def attn_chained(q0, kq_, vq_, lengths_):
    def body(carry, _):
      out = attn_all_layers(carry, kq_, vq_, lengths_)
      return out * 1e-3, None
    return jax.lax.scan(body, q0, None, length=iters)[0]

  jit_attn = jax.jit(attn_chained)
  v = np.asarray(jit_attn(q, kq, vq, lengths))
  t0 = time.perf_counter()
  v = np.asarray(jit_attn(q, kq, vq, lengths))
  results['attention'] = ((time.perf_counter() - t0 - results['host_sync'])
                          / iters)
  # K + V int8 stream once per layer (the kernel reads the whole
  # allocated cache; q/out/scales are negligible next to it).
  seg_bytes['attention'] = L * 2 * batch * NK * S * H
  log(f"attention x{L}: {results['attention']*1e3:.3f} ms")

  # -- FC sweep: every FC weight through its production dispatch.
  from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
  sg = graph.subgraphs[sig.subgraph_index]
  fc_keys = [(sig.subgraph_index, op.inputs[1]) for op in sg.ops
             if op.opcode == 'FULLY_CONNECTED' and len(op.inputs) > 1]
  # MLP fusion replaces per-FC weights with synthetic grouped/concat keys
  # (negative tids); sweep what actually lives in the serving weight dict.
  fused_out = [k for k in fc_keys if k not in weights]
  fc_keys = [k for k in fc_keys if k in weights]
  if fused_out:
    log(f'fc sweep: {len(fused_out)} weights folded into megakernels '
        '(measured inside the full step, not here)')
  x_by_k = {}

  def fc_one(w, xs, key):
    arr = w[key]
    packed = key in ex._packed_int4_keys
    k_dim = arr.shape[1] * (2 if packed else 1)
    x = xs[k_dim]
    if packed:
      true_n = ex._packed_pad_n.get(key)
      bn = 512 if arr.shape[0] >= 65536 else 256
      y = pallas_qmatmul.qmatmul_pallas_int4_packed(
          x, arr, ex._packed_scale[key], bn=bn, interpret=not on_tpu)
      if true_n is not None:
        y = y[..., :true_n]
      return y
    t = sg.tensors[key[1]]
    scale = jnp.asarray(np.asarray(t.quantization.scale, np.float32)
                        ) if t.quantization is not None else 1.0
    w = arr.astype(jnp.float32)
    if t.quantization is not None:
      w = w * scale.reshape(-1, 1)
    return x @ w.T

  for key in fc_keys:
    arr = weights[key]
    packed = key in ex._packed_int4_keys
    k_dim = arr.shape[1] * (2 if packed else 1)
    if k_dim not in x_by_k:
      # bf16 activations (the serving dtype): an f32 [256, 16384] x block
      # would blow the 16 MB VMEM scoped limit.
      x_by_k[k_dim] = jax.random.normal(
          jax.random.PRNGKey(k_dim), (batch, k_dim)).astype(jnp.bfloat16)

  def fc_sweep_chained(w, xs):
    def body(carry, _):
      acc = carry
      for key in fc_keys:
        xs_k = {k: v + acc.astype(v.dtype) for k, v in xs.items()}
        acc = acc + fc_one(w, xs_k, key).reshape(-1)[0].astype(
            jnp.float32) * 1e-30
      return acc, None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

  jit_fc = jax.jit(fc_sweep_chained)
  v = float(jit_fc(weights, x_by_k))
  t0 = time.perf_counter()
  v = float(jit_fc(weights, x_by_k))
  results['fc_sweep'] = ((time.perf_counter() - t0 - results['host_sync'])
                         / iters)
  seg_bytes['fc_sweep'] = sum(int(weights[k].nbytes) for k in fc_keys)
  log(f"fc sweep ({len(fc_keys)} FCs): {results['fc_sweep']*1e3:.3f} ms")

  # -- cache DUS updates: int8 one-position write x L x 2.
  upd = jax.random.normal(jax.random.PRNGKey(7), (batch, NK, 1, H),
                          jnp.float32)

  def cache_updates_chained(kq_, vq_, upd_):
    def body(carry, _):
      kq_c, vq_c = carry
      u = jnp.clip(jnp.round(upd_ / 0.06), -127, 127).astype(jnp.int8)
      new_k, new_v = kq_c, vq_c
      for _ in range(L):
        new_k = jax.lax.dynamic_update_slice(new_k, u, (0, 0, 64, 0))
        new_v = jax.lax.dynamic_update_slice(new_v, u, (0, 0, 64, 0))
      return (new_k, new_v), None
    return jax.lax.scan(body, (kq_, vq_), None, length=iters)[0][0]

  # Donate the caches: without it the scan carry COPIES the 4.3 GiB
  # cache pool every iteration (measured 120 ms/iter of pure memcpy).
  jit_dus = jax.jit(cache_updates_chained, donate_argnums=(0, 1))
  v = np.asarray(jit_dus(jnp.copy(kq), jnp.copy(vq), upd))[0, 0, 0, 0]
  a, b2 = jnp.copy(kq), jnp.copy(vq)
  jax.block_until_ready([a, b2])
  t0 = time.perf_counter()
  v = np.asarray(jit_dus(a, b2, upd))[0, 0, 0, 0]
  results['cache_dus'] = ((time.perf_counter() - t0 - results['host_sync'])
                          / iters)
  seg_bytes['cache_dus'] = 2 * L * batch * NK * H  # int8 writes
  log(f"cache DUS x{L}x2: {results['cache_dus']*1e3:.3f} ms")

  # cache_dus is EXCLUDED from the accounting: even with donated inputs
  # the standalone scan pays a carry copy of the 4.3 GiB pool per
  # iteration (the real step's writes are in-place inside one program),
  # so the segment measures the copy, not the write.
  known = results['attention'] + results['fc_sweep']
  residual = results['full'] - known
  log(f"accounted (attention+fc): {known*1e3:.3f} of "
      f"{results['full']*1e3:.3f} ms "
      f"({100*known/max(results['full'],1e-12):.0f}%); residual "
      f"{residual*1e3:.3f} ms = XLA glue + cache writes "
      f"(negative => the step overlaps the FC and attention streams)")

  artifact = {
      'preset': preset, 'batch': batch, 'iters': iters,
      'start_pos': start_pos,
      'backend': jax.default_backend(),
      'segments_ms': {k: round(t * 1e3, 3) for k, t in results.items()},
      'segments_gbs': {
          k: round(seg_bytes[k] / results[k] / 1e9, 1)
          for k in seg_bytes if results.get(k)
      },
      'weight_bytes': weight_bytes,
      'cache_bytes': cache_bytes,
      'accounted_ms': round(known * 1e3, 3),
      'residual_ms': round(residual * 1e3, 3),
      'accounted_frac': round(known / max(results['full'], 1e-12), 4),
      'cache_dus_note': 'standalone DUS segment measures a scan-carry '
                        'copy of the pool, not the in-step write; '
                        'excluded from accounted_ms',
      'step_sustained_gbs': round(
          seg_bytes['full'] / results['full'] / 1e9, 1),
  }
  out_path = os.environ.get(
      'AEQT_PROF_OUT',
      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
          __file__))), 'DECODE_PROFILE_r04.json'))
  if out_path:
    with open(out_path, 'w') as f:
      json.dump(artifact, f, indent=1)
    log(f'artifact written: {out_path}')
  for k, t in results.items():
    gbs = (f' ({seg_bytes[k]/t/1e9:.0f} GB/s)'
           if k in seg_bytes and t else '')
    print(f'{k}: {t*1e3:.3f} ms{gbs}')


if __name__ == '__main__':
  main()
