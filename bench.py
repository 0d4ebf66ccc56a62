"""Benchmark: Gemma-2B-class int4 weight-only decode, tokens/s/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s/chip", "vs_baseline": N}

`vs_baseline` is the fraction of the speed-of-light decode rate implied by
HBM bandwidth (weights must stream once per decode step); the reference
publishes no TPU numbers (BASELINE.md), so speed-of-light is the yardstick.

Env knobs: AEQT_BENCH_PRESET (gemma2b_lite | toy), AEQT_BENCH_BATCH,
AEQT_BENCH_STEPS.
"""

import json
import os
import sys
import time


def log(*args):
  print(*args, file=sys.stderr, flush=True)


def main():
  import jax
  import numpy as np

  from ai_edge_quantizer_tpu import Quantizer
  from ai_edge_quantizer_tpu.execution import executor as executor_lib
  from ai_edge_quantizer_tpu.models import gemma

  preset = os.environ.get('AEQT_BENCH_PRESET', 'gemma2b_lite')
  batch = int(os.environ.get('AEQT_BENCH_BATCH', '8'))
  steps = int(os.environ.get('AEQT_BENCH_STEPS', '16'))
  warmup = 3

  if preset == 'toy':
    cfg = gemma.TOY_DECODER
  else:
    cfg = gemma.GEMMA_2B_LITE

  log(f'bench: preset={preset} cfg layers={cfg.num_layers} '
      f'dim={cfg.embed_dim} batch={batch} backend={jax.default_backend()}')

  t0 = time.time()
  # Structure on host, weights generated + int4/int8-quantized ON DEVICE —
  # the host never materializes the fp32 weights.
  graph = gemma.build_decoder(cfg, batch=batch, prefill_len=8,
                              signatures=('decode',),
                              materialize_weights=False)
  log(f'build graph: {time.time()-t0:.1f}s')
  t0 = time.time()
  weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                               embedding_bits=8)
  jax.block_until_ready(list(weights.values()))
  log(f'device quantize: {time.time()-t0:.1f}s')
  quantized = graph

  ex = executor_lib.GraphExecutor(quantized)
  ex._weights = weights
  if os.environ.get('AEQT_BENCH_PACKED', '1') == '1' and \
      jax.default_backend() == 'tpu':
    t0 = time.time()
    ex.prepare_serving_weights()  # packed-int4 + fused Pallas kernel path
    jax.block_until_ready(list(ex._weights.values()))
    log(f'pack int4 weights: {time.time()-t0:.1f}s '
        f'({len(ex._packed_int4_keys)} packed)')
  weights = ex._weights
  sig = quantized.signature_by_key('decode')
  import functools
  fn = functools.partial(
      ex._run_signature, sig.subgraph_index, 'decode', False)
  jitted = jax.jit(fn)

  inputs = gemma.make_inputs(cfg, 'decode', batch, 1, start_pos=64)
  inputs = {k: jax.device_put(v) for k, v in inputs.items()}

  weight_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                     for v in weights.values())
  log(f'device weight bytes: {weight_bytes/2**30:.2f} GiB')

  def step(w, inp):
    out = jitted(w, inp)
    # Feed updated caches back (steady-state decode).
    nxt = dict(inp)
    for li in range(cfg.num_layers):
      nxt[f'layer_{li}_k_cache_in'] = out[f'layer_{li}_k_cache']
      nxt[f'layer_{li}_v_cache_in'] = out[f'layer_{li}_v_cache']
    return out, nxt

  t0 = time.time()
  out, inputs = step(weights, inputs)
  jax.block_until_ready(out['logits'])
  log(f'compile+first step: {time.time()-t0:.1f}s')

  for _ in range(warmup - 1):
    out, inputs = step(weights, inputs)
  jax.block_until_ready(out['logits'])

  t0 = time.time()
  for _ in range(steps):
    out, inputs = step(weights, inputs)
  jax.block_until_ready(out['logits'])
  elapsed = time.time() - t0
  tokens_s = batch * steps / elapsed
  log(f'{steps} steps in {elapsed:.3f}s -> {tokens_s:.1f} tokens/s')

  # Speed of light: every weight byte streams HBM->VMEM once per step.
  hbm_bw = 819e9 if jax.default_backend() == 'tpu' else 50e9
  sol_steps_s = hbm_bw / max(weight_bytes, 1)
  sol_tokens_s = sol_steps_s * batch
  vs = tokens_s / sol_tokens_s

  print(json.dumps({
      'metric': f'{preset}_int4_decode_tokens_per_s_per_chip',
      'value': round(tokens_s, 2),
      'unit': 'tokens/s/chip',
      'vs_baseline': round(vs, 4),
  }))


if __name__ == '__main__':
  main()
