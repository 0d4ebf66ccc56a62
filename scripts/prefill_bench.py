"""Prefill throughput / TTFT on the real chip (Gemma-2B-lite, B=1).

Measures one full-prompt prefill pass (T tokens in one program — the
TTFT-dominant step for a T-token prompt) through the packed-int4 serving
path with the flash prefill attention kernel over int8 KV.

Run: python scripts/prefill_bench.py   [AEQT_PREFILL_T=1024 AEQT_PREFILL_B=1]
"""

import functools
import os
import sys
import time

sys.path.insert(0, '.')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ai_edge_quantizer_tpu.execution import executor as executor_lib  # noqa: E402
from ai_edge_quantizer_tpu.models import gemma  # noqa: E402


def log(msg):
  print(msg, file=sys.stderr, flush=True)


def main():
  t_len = int(os.environ.get('AEQT_PREFILL_T', '1024'))
  batch = int(os.environ.get('AEQT_PREFILL_B', '1'))
  cfg = gemma.GEMMA_2B_LITE
  log(f'prefill bench: B={batch} T={t_len} layers={cfg.num_layers} '
      f'dim={cfg.embed_dim} backend={jax.default_backend()}')

  fused = os.environ.get('AEQT_BENCH_FUSED_PROJ', '1') == '1'
  graph = gemma.build_decoder(
      cfg, batch=batch, prefill_len=t_len, signatures=('prefill',),
      materialize_weights=False, fused_projections=fused)
  gemma.stamp_int8_kv_cache(graph)
  t0 = time.time()
  cache_path = f'/tmp/aeqt_prefill_weights_lite_f{int(fused)}.npz'
  weights = None
  if os.path.exists(cache_path):
    try:
      weights = gemma.load_materialized(graph, cache_path)
      jax.block_until_ready(list(weights.values()))
      log(f'weights from cache: {time.time()-t0:.1f}s')
    except Exception:  # noqa: BLE001
      weights = None
  if weights is None:
    weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                                 embedding_bits=8)
    jax.block_until_ready(list(weights.values()))
    log(f'device quantize: {time.time()-t0:.1f}s')
    try:
      gemma.save_materialized(graph, weights, cache_path)
    except Exception:  # noqa: BLE001
      pass

  ex = executor_lib.GraphExecutor(graph, activation_dtype='bfloat16')
  ex._weights = weights
  if jax.default_backend() == 'tpu':
    ex.prepare_serving_weights(min_weight_params=0)
  weights = ex._weights
  sig = graph.signature_by_key('prefill')
  run_sig = functools.partial(
      ex._run_signature, sig.subgraph_index, 'prefill', False)

  base_inputs = gemma.make_inputs(cfg, 'prefill', batch, t_len, start_pos=0)
  iters = int(os.environ.get('AEQT_PREFILL_ITERS', '8'))

  def chained(w, inputs, salt):
    """`iters` prefills chained through a token-derived carry so XLA
    cannot CSE/hoist the repeated pass (tunnel lesson: loop-invariant
    bodies measure fantasy numbers)."""
    def body(carry, _):
      inp = dict(inputs)
      inp['tokens'] = (inputs['tokens'] + carry) % cfg.vocab_size
      out = run_sig(w, inp)
      new_carry = (jnp.max(out['logits'][:, -1, :]) * 0.0).astype(
          jnp.int32) + carry + 1
      return new_carry, out['logits'][0, -1, 0]
    carry, probe = jax.lax.scan(body, salt, None, length=iters)
    return carry, probe

  jitted = jax.jit(chained)
  inputs = {k: jax.device_put(v) for k, v in base_inputs.items()}

  t0 = time.time()
  out = jitted(weights, inputs, jnp.int32(1))
  float(jnp.sum(out[1]))  # value-fetch sync
  log(f'compile+first chunk ({iters} prefills): {time.time()-t0:.1f}s')

  # round-trip cost
  small = jnp.ones(())
  rts = []
  for _ in range(5):
    t0 = time.time()
    float(small + 0)
    rts.append(time.time() - t0)
  rt = min(rts)

  t0 = time.time()
  out = jitted(weights, inputs, jnp.int32(2))
  float(jnp.sum(out[1]))
  dt = (time.time() - t0 - rt) / iters
  toks = batch * t_len / dt
  print(f'prefill B={batch} T={t_len}: {dt*1e3:.2f} ms/pass '
        f'({toks:.0f} prefill tokens/s; TTFT for a {t_len}-token prompt '
        f'~= {dt*1e3:.2f} ms)')


if __name__ == '__main__':
  main()
