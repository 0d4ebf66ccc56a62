"""A/B the packed-int4 N-tile on the full-vocab logits head shape.

The GEMMA_2B logits matmul ([B,2048] x [256128,2048]^T int4) dominates the
full-vocab decode step. N=256128 only tiles at 128; padded to 256512 it
tiles at 128/256/512. This measures all of them on the real chip.

Run: python scripts/vocab_tile_bench.py   (TPU; ~1 min)
"""

import os
import sys
import time

import jax

if os.environ.get('JAX_PLATFORMS'):
  jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from ai_edge_quantizer_tpu.kernels import pallas_qmatmul  # noqa: E402


def sync(y):
  return float(jnp.sum(jnp.abs(y[0]).astype(jnp.float32)))


def timeit(fn, *args, iters=64):
  sync(fn(*args))
  # Measure the value-fetch round trip to subtract (warm the sync op's own
  # compile first, then take the min of several samples).
  small = jnp.ones((1, 1), jnp.float32)
  sync(small)
  rt = min(_sample_rt(small) for _ in range(5))
  t0 = time.perf_counter()
  out = None
  for _ in range(iters):
    out = fn(*args)
  s = sync(out)
  dt = (time.perf_counter() - t0 - rt) / iters
  return max(dt, 1e-9), s


def _sample_rt(small):
  t0 = time.perf_counter()
  sync(small)
  return time.perf_counter() - t0


def main():
  m, k, n_true = int(os.environ.get('AEQT_VOCAB_BATCH', '16')), 2048, 256128
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
  print(f'case: [{m},{k}] x [{n_true},{k}]^T int4-packed on '
        f'{jax.devices()[0]}', flush=True)

  cases = ((n_true, (128,)), (256512, (128, 256, 512)),
           (16384, (256, 512)), (2048, (256, 512)))
  if os.environ.get('AEQT_VOCAB_ONLY'):
    cases = ((256512, (256, 512)),)
  for n, bns in cases:
    w_q = jnp.asarray(rng.integers(-7, 8, size=(n, k)), jnp.int8)
    w_packed = jax.device_put(pallas_qmatmul.pack_int4_split(w_q))
    scale = jnp.asarray(rng.random(n) * 0.01 + 0.001, jnp.float32)
    del w_q
    for bn in bns:
      fn = jax.jit(lambda x, w, s, bn=bn:
                   pallas_qmatmul.qmatmul_pallas_int4_packed(x, w, s, bn=bn))
      try:
        dt, _ = timeit(fn, x, w_packed, scale)
        gbps = (n * k // 2) / dt / 1e9
        print(f'n={n} bn={bn:4d}: {dt*1e6:8.1f} us  {gbps:7.1f} GB/s '
              'weight stream', flush=True)
      except Exception as e:  # noqa: BLE001
        print(f'n={n} bn={bn:4d}: FAILED {type(e).__name__}: '
              f'{str(e)[:160]}', flush=True)


if __name__ == '__main__':
  main()
