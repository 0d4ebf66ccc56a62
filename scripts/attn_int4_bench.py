"""Attention-kernel A/B at the decode-bench shape: int8 vs int4 KV.

Decode attention dominates the headline step (DECODE_PROFILE_r04:
5.75 ms of 8.81 ms, at the int8 kernel's own DMA floor), so halving the
cache stream is the one remaining step-level lever. Measures, chained
x L like decode_profile:

  int8        decode_attention_int8_lengths (the serving default)
  int4_row    decode_attention_int4_lengths (per-row scales)
  int4_group  decode_attention_int4_group_lengths (per-group-16 asym K)

Run: python scripts/attn_int4_bench.py   (TPU)
Env: AEQT_AB_BATCH/SEQ/LAYERS/HEADDIM/GROUPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
if os.environ.get('JAX_PLATFORMS'):
  jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
try:
  _cache_dir = os.environ.get('AEQT_XLA_CACHE', '/tmp/aeqt_xla_cache')
  os.makedirs(_cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', _cache_dir)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:  # noqa: BLE001
  pass
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.kernels import pallas_attention as pa


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  B = int(os.environ.get('AEQT_AB_BATCH', '256'))
  S = int(os.environ.get('AEQT_AB_SEQ', '1024'))
  L = int(os.environ.get('AEQT_AB_LAYERS', '18'))
  H = int(os.environ.get('AEQT_AB_HEADDIM', '256'))
  NK, G = 1, 8  # Gemma-2B MQA
  group = 16
  iters = int(os.environ.get('AEQT_AB_ITERS', '16'))
  on_tpu = jax.default_backend() == 'tpu'
  log(f'attn A/B: B={B} NK={NK} G={G} H={H} S={S} L={L} '
      f'backend={jax.default_backend()}')

  # Operands generated ON DEVICE (jax.random): the tunnel's host->device
  # transfer path wedges for multi-KB payloads in its degraded phases,
  # while device-side programs keep running.
  key = jax.random.PRNGKey(0)
  kq_, kk_, kv_ = jax.random.split(key, 3)
  q = jax.random.normal(kq_, (B, NK, G, H), jnp.float32)
  k = jax.random.normal(kk_, (B, NK, S, H), jnp.float32) * 0.3 + 0.4
  v = jax.random.normal(kv_, (B, NK, S, H), jnp.float32) * 0.3
  lengths = jnp.full((B,), S - 2, jnp.int32)

  # int8 operands (calibrated per-tensor scales, the serving recipe flow)
  ks8 = float(jnp.max(jnp.abs(k))) / 127.0
  vs8 = float(jnp.max(jnp.abs(v))) / 127.0
  k8 = jnp.clip(jnp.round(k / ks8), -127, 127).astype(jnp.int8)
  v8 = jnp.clip(jnp.round(v / vs8), -127, 127).astype(jnp.int8)
  # int4 per-row operands
  kp_r, ks_r = pa.quantize_kv_rows_int4(k)
  vp_r, vs_r = pa.quantize_kv_rows_int4(v)
  scales_r = jnp.zeros((B, NK, 8, S), jnp.bfloat16)
  scales_r = scales_r.at[:, :, 0, :].set(ks_r.astype(jnp.bfloat16))
  scales_r = scales_r.at[:, :, 1, :].set(vs_r.astype(jnp.bfloat16))
  # int4 per-group operands
  kp_g, ks_g, km_g = pa.quantize_k_rows_int4_asym(k, group)
  vp_g, vs_g = pa.quantize_v_rows_int4_group(v, group)
  sidecar = pa.build_kv_sidecar_group(ks_g, km_g, vs_g)

  def run(label, fn, *args, bytes_per_layer):
    def chained(q0, *a):
      def body(carry, _):
        out = carry
        for _ in range(L):
          out = fn(out, *a)
        return out * 1e-3, None
      return jax.lax.scan(body, q0, None, length=iters)[0]

    jit = jax.jit(chained)
    v0 = float(jnp.sum(jnp.abs(jit(q, *args))))
    assert np.isfinite(v0)
    t0 = time.perf_counter()
    v0 = float(jnp.sum(jnp.abs(jit(q, *args))))
    dt = (time.perf_counter() - t0) / iters
    gbs = L * bytes_per_layer / dt / 1e9
    log(f'{label}: {dt*1e3:.3f} ms/step-equivalent ({gbs:.0f} GB/s)')
    return dt, gbs

  results = {}
  cache8 = 2 * B * NK * S * H
  dt, gbs = run(
      'int8      ',
      lambda qq, kk, vv, ll: pa.decode_attention_int8_lengths(
          qq, kk, vv, ks8, vs8, ll, interpret=not on_tpu),
      k8, v8, lengths, bytes_per_layer=cache8)
  results['int8'] = {'ms': round(dt * 1e3, 3), 'gbs': round(gbs, 1)}

  cache4r = B * NK * S * H + 2 * B * NK * 8 * S
  dt, gbs = run(
      'int4_row  ',
      lambda qq, kk, vv, sc, ll: pa.decode_attention_int4_lengths(
          qq, kk, vv, sc, ll, interpret=not on_tpu),
      kp_r, vp_r, scales_r, lengths, bytes_per_layer=cache4r)
  results['int4_row'] = {'ms': round(dt * 1e3, 3), 'gbs': round(gbs, 1)}

  cache4g = B * NK * S * H + 2 * B * NK * 3 * (H // group) * S
  dt, gbs = run(
      'int4_group',
      lambda qq, kk, vv, sc, ll: pa.decode_attention_int4_group_lengths(
          qq, kk, vv, sc, ll, group=group, interpret=not on_tpu),
      kp_g, vp_g, sidecar, lengths, bytes_per_layer=cache4g)
  results['int4_group'] = {'ms': round(dt * 1e3, 3), 'gbs': round(gbs, 1)}

  # Numeric cross-check on this data (relative error vs float attention).
  scores = jnp.einsum('bngh,bnsh->bngs', q, k) / (H ** 0.5)
  pos = jnp.arange(S)[None, None, None, :]
  scores = jnp.where(pos < lengths[:, None, None, None], scores, -1e30)
  probs = jax.nn.softmax(scores, axis=-1)
  ref = jnp.einsum('bngs,bnsh->bngh', probs, v)
  for label, out in (
      ('int8', pa.decode_attention_int8_lengths(
          q, k8, v8, ks8, vs8, lengths, interpret=not on_tpu)),
      ('int4_row', pa.decode_attention_int4_lengths(
          q, kp_r, vp_r, scales_r, lengths, interpret=not on_tpu)),
      ('int4_group', pa.decode_attention_int4_group_lengths(
          q, kp_g, vp_g, sidecar, lengths, group=group,
          interpret=not on_tpu))):
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    results[label]['rel_err_vs_float'] = round(rel, 5)
    log(f'{label}: rel err vs float attention {rel:.4f}')

  out_path = os.environ.get('AEQT_AB_OUT',
                            '/root/repo/ATTN_INT4_AB_r04.json')
  artifact = {'B': B, 'NK': NK, 'G': G, 'H': H, 'S': S, 'L': L,
              'group': group, 'backend': jax.default_backend(),
              'kernels': results}
  with open(out_path, 'w') as f:
    json.dump(artifact, f, indent=1)
  print(json.dumps(artifact))


if __name__ == '__main__':
  main()
