"""Ablation: where does decode-step time go? Times the full decode step,
an FC-weights-only program, and a cache-ops-only program."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')

from ai_edge_quantizer_tpu.execution import executor as executor_lib  # noqa
from ai_edge_quantizer_tpu.models import gemma  # noqa


def timeit(fn, *args, iters=16):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / iters


def main():
  cfg = gemma.GEMMA_2B_LITE
  batch = 8
  graph = gemma.build_decoder(cfg, batch=batch, prefill_len=8,
                              signatures=('decode',),
                              materialize_weights=False)
  weights = gemma.device_materialize_quantized(graph)
  jax.block_until_ready(list(weights.values()))
  ex = executor_lib.GraphExecutor(graph)
  ex._weights = weights
  sig = graph.signature_by_key('decode')
  import functools
  full = jax.jit(functools.partial(
      ex._run_signature, sig.subgraph_index, 'decode', False))
  inputs = gemma.make_inputs(cfg, 'decode', batch, 1, start_pos=64)
  inputs = {k: jax.device_put(v) for k, v in inputs.items()}
  dt = timeit(full, weights, inputs)
  print(f'full decode step: {dt*1e3:.2f} ms', flush=True)

  # FC matmuls only (all quantized weights, same shapes as the model).
  sg = graph.subgraphs[sig.subgraph_index]
  fc_ws = []
  for op in sg.ops:
    if op.opcode == 'FULLY_CONNECTED':
      key = (sig.subgraph_index, op.inputs[1])
      if key in weights:
        fc_ws.append((weights[key],
                      jnp.ones(weights[key].shape[0], jnp.float32)))
  print(f'{len(fc_ws)} FC weights, '
        f'{sum(int(np.prod(w.shape)) for w, _ in fc_ws)/2**30:.2f} GiB',
        flush=True)

  def fc_only(ws, x):
    outs = []
    for w, s in ws:
      acc = jax.lax.dot_general(
          x[:, :w.shape[1]], w,
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      outs.append(jnp.sum(acc * s))
    return sum(outs)

  x = jnp.ones((batch, max(w.shape[1] for w, _ in fc_ws)), jnp.float32)
  dt_fc = timeit(jax.jit(fc_only), fc_ws, x)
  print(f'FC-only program: {dt_fc*1e3:.2f} ms', flush=True)

  # Cache traffic only: DUS + BMM reads over all layers.
  caches = [inputs[f'layer_{li}_k_cache_in'] for li in
            range(cfg.num_layers)]
  upd = jnp.ones((batch, cfg.num_kv_heads, 1, cfg.head_dim), jnp.float32)

  def cache_only(cs):
    total = 0.0
    for c in cs:
      c2 = jax.lax.dynamic_update_slice(c, upd, (0, 0, 64, 0))
      q = jnp.ones((batch, cfg.num_kv_heads, 8, cfg.head_dim), jnp.float32)
      scores = jnp.einsum('bkgh,bksh->bkgs', q, c2)
      total = total + jnp.sum(scores)
    return total

  dt_cache = timeit(jax.jit(cache_only), caches)
  print(f'cache-ops program (k-cache only): {dt_cache*1e3:.2f} ms', flush=True)


if __name__ == '__main__':
  main()
