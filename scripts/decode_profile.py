"""Decode-step segment profile: where does the step time actually go?

On-device scan timing (the only trustworthy clock through the axon
tunnel): each segment runs ITERS times inside ONE jitted lax.scan, so the
measured wall time is device compute + a single dispatch.

Segments at the bench configuration (B, int8 KV, packed int4):
  full        — the whole decode step
  attention   — fused int8-KV masked attention x num_layers
  fc_sweep    — every FC weight at its true shape/count (packed or XLA)
  cache_dus   — int8 cache DUS updates x num_layers x 2

Env: AEQT_PROF_PRESET (gemma2b_lite|gemma2b|toy), AEQT_PROF_BATCH,
AEQT_PROF_ITERS.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
if os.environ.get('JAX_PLATFORMS'):
  jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.execution import executor as executor_lib  # noqa
from ai_edge_quantizer_tpu.models import gemma  # noqa


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def scan_time(fn, iters, *args):
  """Seconds per fn(*args) call: one jitted scan of `iters` steps.

  args pass through jit as REAL arguments (device buffers), never as
  closure-captured lowering constants — a closed-over cache pool would
  otherwise duplicate gigabytes into the executable. A data dependence
  threads each step's output into the carry so steps cannot be elided."""
  def scanned(*a):
    def body(carry, _):
      out = fn(*a)
      leaf = jax.tree_util.tree_leaves(out)[0]
      bump = leaf.reshape(-1)[0].astype(jnp.float32)
      return carry + bump * 1e-30, None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

  jitted = jax.jit(scanned)
  v = float(jitted(*args))  # compile + first run
  t0 = time.perf_counter()
  v = float(jitted(*args))
  dt = time.perf_counter() - t0
  assert np.isfinite(v)
  return dt / iters


def main():
  preset = os.environ.get('AEQT_PROF_PRESET', 'gemma2b_lite')
  batch = int(os.environ.get('AEQT_PROF_BATCH', '256'))
  iters = int(os.environ.get('AEQT_PROF_ITERS', '16'))
  cfg = {'toy': gemma.TOY_DECODER, 'gemma2b': gemma.GEMMA_2B,
         'gemma2b_lite': gemma.GEMMA_2B_LITE}[preset]
  log(f'profile: {preset} batch={batch} iters={iters} '
      f'backend={jax.default_backend()}')

  graph = gemma.build_decoder(cfg, batch=batch, prefill_len=8,
                              signatures=('decode',),
                              materialize_weights=False)
  gemma.stamp_int8_kv_cache(graph)
  weights = gemma.device_materialize_quantized(graph, fc_bits=4,
                                               embedding_bits=8)
  jax.block_until_ready(list(weights.values()))
  ex = executor_lib.GraphExecutor(graph, activation_dtype='bfloat16')
  ex._weights = weights
  on_tpu = jax.default_backend() == 'tpu'
  if on_tpu:
    ex.prepare_serving_weights(min_weight_params=0)
  log(f'packed FCs: {len(ex._packed_int4_keys)}; '
      f'attn fusions: {len(ex._attn_fusions)}')
  weights = ex._weights
  sig = graph.signature_by_key('decode')
  run_sig = functools.partial(
      ex._run_signature, sig.subgraph_index, 'decode', False)
  inputs = gemma.make_inputs(cfg, 'decode', batch, 1, start_pos=64)
  dec_sg = graph.subgraphs[sig.subgraph_index]
  for name, tid in sig.inputs.items():
    # Feed caches pre-quantized: a float cache pool would be gigabytes of
    # pointless f32 on device.
    if name.endswith('_cache_in') and dec_sg.tensors[tid].dtype == 'int8':
      inputs[name] = np.zeros(inputs[name].shape, np.int8)
  inputs = {k: jax.device_put(np.asarray(v)) for k, v in inputs.items()}

  NK, H, S = cfg.num_kv_heads, cfg.head_dim, cfg.max_seq_len
  G = cfg.num_query_heads // cfg.num_kv_heads
  L = cfg.num_layers

  results = {}

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
      nxt = jnp.argmax(out['logits'][:, -1, :], axis=-1).astype(
          jnp.int32)[:, None]
      return (new_caches, nxt, pos_c + 1), None
    (caches, tokens, pos), _ = jax.lax.scan(
        body, (caches, tokens, pos), None, length=iters)
    return tokens

  caches0 = {k: inputs[k] for k in cache_keys}
  tokens0 = inputs['tokens']
  jit_full = jax.jit(full_chunk)
  v = np.asarray(jit_full(weights, caches0, tokens0, jnp.int32(64)))
  t0 = time.perf_counter()
  v = np.asarray(jit_full(weights, caches0, tokens0, jnp.int32(64)))
  results['full'] = (time.perf_counter() - t0) / iters
  log(f"full step (chained): {results['full']*1e3:.3f} ms")

  # -- attention only: the fused masked kernel at bench shapes x L.
  from ai_edge_quantizer_tpu.kernels import pallas_attention
  rngk = np.random.default_rng(0)
  q = jnp.asarray(rngk.standard_normal((batch, NK, G, H)), jnp.float32)
  kq = jnp.asarray(rngk.integers(-127, 127, (batch, NK, S, H)), jnp.int8)
  vq = jnp.asarray(rngk.integers(-127, 127, (batch, NK, S, H)), jnp.int8)
  mask = jnp.zeros((batch, 1, G, S), jnp.float32)

  def attn_all_layers(q_, kq_, vq_, mask_):
    # Chained: each layer consumes the previous output (reshaped back to
    # the q shape), so nothing is loop-invariant.
    out = q_
    for _ in range(L):
      out = pallas_attention.decode_attention_int8_masked(
          out, kq_, vq_, 0.06, 0.06, mask_, interpret=not on_tpu)
    return out

  def attn_chained(q0, kq_, vq_, mask_):
    def body(carry, _):
      out = attn_all_layers(carry, kq_, vq_, mask_)
      return out * 1e-3, None
    return jax.lax.scan(body, q0, None, length=iters)[0]

  jit_attn = jax.jit(attn_chained)
  v = np.asarray(jit_attn(q, kq, vq, mask))
  t0 = time.perf_counter()
  v = np.asarray(jit_attn(q, kq, vq, mask))
  results['attention'] = (time.perf_counter() - t0) / iters
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
      x_by_k[k_dim] = jnp.asarray(
          rngk.standard_normal((batch, k_dim)), jnp.bfloat16)

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
  results['fc_sweep'] = (time.perf_counter() - t0) / iters
  log(f"fc sweep ({len(fc_keys)} FCs): {results['fc_sweep']*1e3:.3f} ms")

  # -- cache DUS updates: int8 one-position write x L x 2.
  upd = jnp.asarray(rngk.standard_normal((batch, NK, 1, H)), jnp.float32)

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

  jit_dus = jax.jit(cache_updates_chained)
  v = np.asarray(jit_dus(kq, vq, upd))[0, 0, 0, 0]
  t0 = time.perf_counter()
  v = np.asarray(jit_dus(kq, vq, upd))[0, 0, 0, 0]
  results['cache_dus'] = (time.perf_counter() - t0) / iters
  log(f"cache DUS x{L}x2: {results['cache_dus']*1e3:.3f} ms")

  known = results['attention'] + results['fc_sweep'] + results['cache_dus']
  log(f"accounted: {known*1e3:.3f} of {results['full']*1e3:.3f} ms "
      f"({100*known/max(results['full'],1e-12):.0f}%); residual "
      f"{1e3*(results['full']-known):.3f} ms = XLA glue "
      f"(rope/norm/residual/reshape/embed)")
  for k, v in results.items():
    print(f'{k}: {v*1e3:.3f} ms')


if __name__ == '__main__':
  main()
