"""Per-op device trace of the REAL bench decode step.

Runs bench.py's exact decode chunk under jax.profiler and aggregates the
TPU-device op events by HLO op, so every microsecond of the step is
attributed to a named op (attention custom-calls, packed-FC
custom-calls, XLA fusions = glue, DUS cache writes, copies). This is the
ground truth the segment-level decode_profile.py can only approximate.

Env: AEQT_TRACE_PRESET, AEQT_TRACE_BATCH, AEQT_TRACE_INNER (default 4),
AEQT_TRACE_TOP (default 40).
"""

import functools
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

os.environ.setdefault('AEQT_INT4_DRQ', '1')
os.environ.setdefault('AEQT_ATTN_LENGTHS', '1')
if os.environ.get('AEQT_TRACE_BLOCK') == '1':
  os.environ.setdefault('AEQT_MLP_BF', '2048')
  os.environ.setdefault('AEQT_DECODE_BLOCK', '1')
  os.environ.setdefault('AEQT_ATTN_WRITEBACK', '1')
  os.environ.setdefault('AEQT_ATTN_WRITEBACK_MODE', 'stale')
  os.environ.setdefault('AEQT_BLOCK_RING', '8')
  os.environ.setdefault('AEQT_ATTN_BB', '8')

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


def build_step():
  preset = os.environ.get('AEQT_TRACE_PRESET', 'gemma2b')
  batch = int(os.environ.get('AEQT_TRACE_BATCH', '256'))
  cfg = {'toy': gemma.TOY_DECODER, 'gemma2b': gemma.GEMMA_2B,
         'gemma7b': gemma.GEMMA_7B,
         'gemma2b_lite': gemma.GEMMA_2B_LITE}[preset]
  if preset == 'gemma7b':
    batch = int(os.environ.get('AEQT_TRACE_BATCH_7B', '16'))
    cfg = __import__('dataclasses').replace(cfg, max_seq_len=512)
  graph = gemma.build_decoder(cfg, batch=batch, prefill_len=8,
                              signatures=('decode',),
                              materialize_weights=False,
                              fused_projections=True, greedy_head=True)
  gemma.stamp_int8_kv_cache(graph)
  cache_path = f'/tmp/aeqt_bench_weights_{preset}_int8_f1.npz'
  weights = None
  if os.path.exists(cache_path):
    try:
      weights = gemma.load_materialized(graph, cache_path)
      log(f'weights from bench cache: {cache_path}')
    except Exception:  # noqa: BLE001
      weights = None
  if weights is None:
    weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                                 embedding_bits=8)
  jax.block_until_ready(list(weights.values()))
  ex = executor_lib.GraphExecutor(graph, activation_dtype='bfloat16')
  ex._weights = weights
  if jax.default_backend() == 'tpu':
    ex.prepare_serving_weights(min_weight_params=0)
  jax.block_until_ready(list(ex._weights.values()))
  weights = ex._weights
  sig = graph.signature_by_key('decode')
  run_sig = functools.partial(
      ex._run_signature, sig.subgraph_index, 'decode', False)
  S = cfg.max_seq_len
  G = cfg.num_query_heads // cfg.num_kv_heads
  start_pos = max(64, S - 128)
  inputs = gemma.make_inputs(cfg, 'decode', batch, 1, start_pos=start_pos)
  dec_sg = graph.subgraphs[sig.subgraph_index]
  cache_keys = [n for n in sig.inputs if n.endswith('_cache_in')]
  caches = {}
  for n in cache_keys:
    t = dec_sg.tensors[sig.inputs[n]]
    dt = {'int8': jnp.int8, 'uint8': jnp.uint8,
          'bfloat16': jnp.bfloat16}.get(t.dtype, jnp.float32)
    caches[n] = jnp.zeros(tuple(t.shape), dt)
    inputs.pop(n, None)
  iota_s = jnp.arange(S, dtype=jnp.int32)
  inner = int(os.environ.get('AEQT_TRACE_INNER', '4'))

  def one_step(w, caches_c, tokens_c, pos_c):
    mask = jnp.where(iota_s[None, None, None, :] <= pos_c,
                     jnp.float32(0.0), jnp.float32(-1e9))
    inp = {
        'tokens': tokens_c,
        'positions': jnp.full((batch, 1), pos_c, jnp.int32),
        'mask': jnp.broadcast_to(mask, (batch, 1, G, S)),
        'cache_pos': jnp.stack(
            [jnp.int32(0), jnp.int32(0), pos_c, jnp.int32(0)]),
    }
    inp.update(caches_c)
    out = run_sig(w, inp)
    new_caches = {n: out[n[:-3]] for n in cache_keys}
    return new_caches, out['next_tokens'].astype(jnp.int32)

  def decode_chunk(w, caches_c, tokens, pos):
    def body(carry, _):
      cc, tok, p = carry
      nc, nt = one_step(w, cc, tok, p)
      return (nc, nt, p + 1), None
    (caches_c, tokens, pos), _ = jax.lax.scan(
        body, (caches_c, tokens, pos), None, length=inner)
    return caches_c, tokens, pos

  vmem_kib = int(os.environ.get('AEQT_VMEM_LIMIT_KIB', '0') or 0)
  jitted = jax.jit(
      decode_chunk, donate_argnums=(1,),
      compiler_options=({'xla_tpu_scoped_vmem_limit_kib': vmem_kib}
                        if vmem_kib else None))
  tokens = jax.device_put(inputs['tokens'])
  pos = jnp.int32(start_pos)
  return jitted, weights, caches, tokens, pos, inner


def main():
  jitted, weights, caches, tokens, pos, inner = build_step()
  t0 = time.time()
  caches, tokens, pos = jitted(weights, caches, tokens, pos)
  float(jnp.sum(tokens))
  log(f'compile+first chunk: {time.time()-t0:.1f}s')
  caches, tokens, pos = jitted(weights, caches, tokens, pos)
  float(jnp.sum(tokens))

  tdir = '/tmp/aeqt_step_trace'
  os.system(f'rm -rf {tdir}')
  jax.profiler.start_trace(tdir)
  caches, tokens, pos = jitted(weights, caches, tokens, pos)
  float(jnp.sum(tokens))
  jax.profiler.stop_trace()

  paths = sorted(glob.glob(f'{tdir}/**/*.trace.json.gz', recursive=True))
  with gzip.open(paths[-1]) as f:
    tr = json.load(f)
  ev = tr['traceEvents']
  dev_pids = set()
  for e in ev:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
      if 'TPU' in e['args'].get('name', ''):
        dev_pids.add(e['pid'])
  # Aggregate complete events on device pids, skipping the outer
  # program-level event (it spans everything).
  import collections
  agg = collections.Counter()
  cnt = collections.Counter()
  total = 0.0
  for e in ev:
    if e.get('ph') != 'X' or e['pid'] not in dev_pids:
      continue
    name = e.get('name', '')
    dur = e.get('dur', 0) / 1e3  # us -> ms
    if name.startswith('jit_decode_chunk') or '(' in name and name.startswith('jit'):
      continue
    agg[name] += dur
    cnt[name] += 1
    total += dur
  per_step = total / inner
  log(f'device op total: {total:.3f} ms over {inner} steps '
      f'= {per_step:.3f} ms/step')
  top = int(os.environ.get('AEQT_TRACE_TOP', '40'))
  print(f'{"ms/step":>9} {"count":>6}  name')
  for name, ms in agg.most_common(top):
    print(f'{ms/inner:9.3f} {cnt[name]//inner:6d}  {name[:110]}')

  # Prefix-aggregated (strip trailing .NN) so per-layer clones merge.
  pagg = collections.Counter()
  pcnt = collections.Counter()
  import re as _re
  for name, ms in agg.items():
    p = _re.sub(r'\.\d+$', '', name)
    pagg[p] += ms
    pcnt[p] += cnt[name]
  print('\nby op prefix (ms/step):')
  for name, ms in pagg.most_common(30):
    print(f'{ms/inner:9.3f} {pcnt[name]//inner:6d}  {name[:90]}')

  # Category buckets by substring.
  buckets = collections.Counter()
  for name, ms in agg.items():
    ln = name.lower()
    if 'custom-call' in ln or 'custom_call' in ln or 'pallas' in ln \
        or 'tpu_custom_call' in ln:
      buckets['custom_call(pallas)'] += ms
    elif 'dynamic-update-slice' in ln or 'dynamic_update_slice' in ln:
      buckets['cache_dus'] += ms
    elif 'copy' in ln:
      buckets['copy'] += ms
    elif 'fusion' in ln:
      buckets['xla_fusion(glue)'] += ms
    elif 'convert' in ln:
      buckets['convert'] += ms
    else:
      buckets['other'] += ms
  print('\ncategory ms/step:')
  for k, v in buckets.most_common():
    print(f'  {k:24s} {v/inner:8.3f}')

  out_path = os.environ.get('AEQT_TRACE_OUT')
  if out_path:
    art = {
        'preset': os.environ.get('AEQT_TRACE_PRESET', 'gemma2b'),
        'mode': ('decode_block'
                 if os.environ.get('AEQT_DECODE_BLOCK') == '1'
                 else 'separate_kernels'),
        'ms_per_step_device_total': round(per_step, 3),
        'by_op_prefix_ms': {
            name: round(ms / inner, 4)
            for name, ms in pagg.most_common(24) if name != 'while'},
        'by_op_count': {name: pcnt[name] // inner
                        for name, _ in pagg.most_common(24)
                        if name != 'while'},
        'note': ('per-op TPU device events from jax.profiler over one '
                 'traced decode chunk; ground-truth attribution (the '
                 'r04 segment-timing profile mixed bandwidth phases)'),
    }
    with open(out_path, 'w') as f:
      json.dump(art, f, indent=1)
    log(f'artifact written: {out_path}')


if __name__ == '__main__':
  main()

# Prefix-aggregated view: strip trailing .NN so per-layer clones merge.
