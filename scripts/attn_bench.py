"""Decode-attention kernel variant A/B at the bench shape.

Chained scan timing (each iteration's q feeds the next) so nothing is
loop-invariant. Reports effective cache-stream bandwidth per variant.
"""

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

from ai_edge_quantizer_tpu.kernels import pallas_attention as pa  # noqa


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def chained_time(fn, q, args, iters=64):
  def run(q0, *rest):
    def body(carry, _):
      out = fn(carry, *rest)
      return out * 1e-3, None
    return jax.lax.scan(body, q0, None, length=iters)[0]

  jitted = jax.jit(run)
  v = float(jnp.sum(jnp.abs(jitted(q, *args))))  # compile + warm
  t0 = time.perf_counter()
  v = float(jnp.sum(jnp.abs(jitted(q, *args))))
  dt = (time.perf_counter() - t0) / iters
  assert np.isfinite(v)
  return dt


def main():
  b = int(os.environ.get('AEQT_ATTN_BATCH', '256'))
  s = int(os.environ.get('AEQT_ATTN_SEQ', '1024'))
  nk, g, h = 1, 8, 256
  on_tpu = jax.default_backend() == 'tpu'
  rng = np.random.default_rng(0)
  q = jnp.asarray(rng.standard_normal((b, nk, g, h)), jnp.float32)
  kq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
  vq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
  mask = jnp.zeros((b, 1, g, s), jnp.float32)
  cache_bytes = 2 * b * nk * s * h
  log(f'attn bench: B={b} S={s} H={h} G={g}; cache {cache_bytes/2**20:.0f}'
      f' MiB/layer; backend={jax.default_backend()}')

  variants = []
  for compute in ('f32', 'bf16', 'int8'):
    for bb in (1, 4, 8, 16):
      variants.append((compute, bb))

  # Dynamic-length kernel at several live-context lengths x row blocks.
  for rb in (8, 16, 4, 1):
    for frac in (1.0, 0.25, 0.125):
      length = int(s * frac)
      lengths = jnp.full((b,), length, jnp.int32)
      label = f'dynlen rb={rb:<2d} {length:4d}/{s}'
      try:
        fn = lambda q_, kq_, vq_, l_: pa.decode_attention_int8_dynlen(
            q_, kq_, vq_, 0.06, 0.06, l_, row_block=rb,
            interpret=not on_tpu)
        dt = chained_time(fn, q, (kq, vq, lengths))
        live = 2 * b * nk * length * h
        print(f'{label} {dt*1e6:9.1f} us  {live/dt/1e9:7.0f} GB/s live '
              f'({cache_bytes/dt/1e9:5.0f} GB/s allocated-equiv)', flush=True)
      except Exception as e:
        print(f'{label} FAILED: {type(e).__name__}: {str(e)[:160]}',
              flush=True)

  ref = None
  for compute, bb in variants:
    label = f'{compute:5s} bb={bb:<3d}'
    try:
      fn = lambda q_, kq_, vq_, m_: pa.decode_attention_int8_masked(
          q_, kq_, vq_, 0.06, 0.06, m_, compute=compute, batch_block=bb,
          interpret=not on_tpu)
      dt = chained_time(fn, q, (kq, vq, mask))
      gbps = cache_bytes / dt / 1e9
      out = np.asarray(fn(q, kq, vq, mask))
      if ref is None:
        ref = np.asarray(pa.decode_attention_int8_masked(
            q, kq, vq, 0.06, 0.06, mask, interpret=not on_tpu))
      err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9))
      print(f'{label} {dt*1e6:9.1f} us  {gbps:7.0f} GB/s  rel_err={err:.2e}',
            flush=True)
    except Exception as e:
      print(f'{label} FAILED: {type(e).__name__}: {str(e)[:160]}',
            flush=True)


if __name__ == '__main__':
  main()
