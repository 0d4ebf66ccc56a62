"""Example: quantize a Gemma-class decoder and serve it with continuous
batching.

Run: python examples/serve_gemma.py  (CPU-friendly toy config)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402

from ai_edge_quantizer_tpu import Quantizer  # noqa: E402
from ai_edge_quantizer_tpu.models import gemma  # noqa: E402
from ai_edge_quantizer_tpu.parallel.batching import (  # noqa: E402
    DecodeServer, make_topk_sampler)


def main():
  import argparse
  parser = argparse.ArgumentParser()
  parser.add_argument('--device', choices=['cpu', 'tpu'], default='cpu',
                      help='backend to run on (default cpu)')
  parser.add_argument('--kv', choices=['int8', 'int4g'], default='int8',
                      help='KV-cache pool: int8 per-tensor (default) or '
                           'int4 per-group-16 packed codes + bf16 sidecar')
  args = parser.parse_args()
  import jax
  if args.device == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

  cfg = gemma.TOY_DECODER
  slots = 4

  # 1. Build the serving graph: prefill (batched admission: up to 2
  #    requests prefill per pass, causal mask derived in-graph) + decode
  #    (batch = slots, per-slot cache scatter), one shared weight store.
  graph = gemma.build_serving_decoder(
      cfg, batch_slots=slots, prefill_len=8, prefill_batch=2,
      prefill_device_masks=True,
      device_masks=(args.kv == 'int4g'),
      kv_int4_group=(16 if args.kv == 'int4g' else 0))
  if args.kv != 'int4g':
    # int8 KV cache for the serving path (int4g carries its own pools).
    gemma.stamp_int8_kv_cache(graph)

  # 2. Quantize: int4 weights on every FC.
  qt = Quantizer(graph)
  qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
  quantized = qt.quantize().quantized_model

  # 3. Serve with continuous batching + top-k sampling.
  server = DecodeServer(quantized, cfg, batch_slots=slots,
                        sample_fn=make_topk_sampler(k=20, temperature=0.8),
                        pack_weights=jax.default_backend() == 'tpu')
  rng = np.random.default_rng(0)
  requests = {}
  for i in range(6):  # more requests than slots: continuous admission
    prompt = rng.integers(0, cfg.vocab_size, size=5)
    rid = server.submit(prompt, max_new_tokens=8)
    requests[rid] = prompt

  transcripts = {rid: [] for rid in requests}
  while server.has_work():
    for rid, token in server.step().items():
      transcripts[rid].append(token)

  for rid, toks in sorted(transcripts.items()):
    print(f'request {rid}: prompt={requests[rid].tolist()} -> {toks}')
  print('metrics:', server.metrics)


if __name__ == '__main__':
  main()
