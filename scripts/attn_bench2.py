"""Decode-attention variant A/B, round 3: chained-18 methodology.

Round-2's attn_bench timed ONE kernel per scan iteration, so the
~0.5-1.5 ms fixed per-iteration cost swamped every variant ("all
205-217 GB/s"). Here each scan iteration chains NCHAIN kernels (carry
feeds q), amortizing the fixed cost 18x — the same methodology that made
the round-2 microbench refresh trustworthy.

Also measures a DMA-FLOOR kernel: identical grid/BlockSpecs, trivial
compute (block sums) — the bandwidth the access pattern itself can
sustain. The gap between a variant and the floor is pure kernel compute
(skinny-MXU dots, int8->f32 conversions, exp).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ai_edge_quantizer_tpu.kernels import pallas_attention as pa  # noqa


def log(*a):
  print(*a, file=sys.stderr, flush=True)


NCHAIN = int(os.environ.get('AEQT_ATTN_NCHAIN', '18'))


def chained_time(fn, q, args, iters=8):
  """Per-KERNEL seconds: iters scan steps x NCHAIN chained calls."""
  def run(q0, *rest):
    def body(carry, _):
      out = carry
      for _ in range(NCHAIN):
        out = fn(out, *rest)
      return out * 1e-2, None
    return jax.lax.scan(body, q0, None, length=iters)[0]

  jitted = jax.jit(run)
  v = float(jnp.sum(jnp.abs(jitted(q, *args))))  # compile + warm
  t0 = time.perf_counter()
  v = float(jnp.sum(jnp.abs(jitted(q, *args))))
  dt = (time.perf_counter() - t0) / (iters * NCHAIN)
  assert np.isfinite(v), 'non-finite chain output'
  return dt


@functools.partial(jax.jit, static_argnames=('bb', 'interpret'))
def dma_floor(q, kq, vq, bb=4, interpret=False):
  """Same blocks as the lengths kernel, trivial compute."""
  b, nk, g, h = q.shape
  s = kq.shape[2]
  bn = b * nk
  q2 = q.reshape(bn, g, h).astype(jnp.float32)
  k2 = kq.reshape(bn, s, h)
  v2 = vq.reshape(bn, s, h)

  def kernel(q_ref, k_ref, v_ref, o_ref):
    # int8 row-sum on the VPU; no conversion of the full block, no MXU.
    ksum = jnp.sum(k_ref[:].astype(jnp.int32), axis=1)  # [bb, h]
    vsum = jnp.sum(v_ref[:].astype(jnp.int32), axis=1)
    o_ref[:] = (q_ref[:]
                + (ksum + vsum).astype(jnp.float32)[:, None, :] * 1e-9)

  out = pl.pallas_call(
      kernel,
      grid=(bn // bb,),
      in_specs=[
          pl.BlockSpec((bb, g, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bb, s, h), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bb, g, h), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((bn, g, h), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      cost_estimate=pl.CostEstimate(
          flops=2 * bn * s * h, bytes_accessed=2 * bn * s * h,
          transcendentals=0),
      interpret=interpret,
  )(q2, k2, v2)
  return out.reshape(b, nk, g, h)


def flat_read_time(nbytes, iters=8):
  """Same-run flat-pool read floor (the bench.py SOL-probe pattern)."""
  rows = nbytes // 1024
  pool = jnp.zeros((rows, 1024), jnp.int8)

  def probe(c0, p):
    def body(c, _):
      i = c.astype(jnp.int32) % 8
      sl = jax.lax.dynamic_slice_in_dim(p, i, p.shape[0] - 8, 0)
      return c + jnp.sum(sl, dtype=jnp.int32).astype(
          jnp.float32) * 1e-30 + 1.0, None
    return jax.lax.scan(body, c0, None, length=iters)[0]

  jitted = jax.jit(probe)
  float(jitted(jnp.float32(0.0), pool))
  t0 = time.perf_counter()
  float(jitted(jnp.float32(0.0), pool))
  return (time.perf_counter() - t0) / iters


def main():
  b = int(os.environ.get('AEQT_ATTN_BATCH', '256'))
  s = int(os.environ.get('AEQT_ATTN_SEQ', '1024'))
  nk, g, h = 1, 8, 256
  on_tpu = jax.default_backend() == 'tpu'
  rng = np.random.default_rng(0)
  q = jnp.asarray(rng.standard_normal((b, nk, g, h)), jnp.float32)
  kq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
  vq = jnp.asarray(rng.integers(-127, 128, (b, nk, s, h)), jnp.int8)
  lengths = jnp.full((b,), s - 16, jnp.int32)
  cache_bytes = 2 * b * nk * s * h
  log(f'attn bench2: B={b} S={s} H={g}; cache '
      f'{cache_bytes/2**20:.0f} MiB/layer; chain={NCHAIN}; '
      f'backend={jax.default_backend()}')

  results = {}

  if on_tpu:
    # Same-run flat floor: is a low kernel number the tunnel phase or the
    # access pattern? (The flat probe has hit 738 GB/s in a fast phase.)
    dt = flat_read_time(NCHAIN * cache_bytes)
    print(f'{"flat_pool (xla)":28s} {dt/NCHAIN*1e6:9.1f} us  '
          f'{NCHAIN*cache_bytes/dt/1e9:7.0f} GB/s', flush=True)

  def run(label, fn, args):
    try:
      dt = chained_time(fn, q, args)
      gbps = cache_bytes / dt / 1e9
      results[label] = (dt, gbps)
      print(f'{label:28s} {dt*1e6:9.1f} us  {gbps:7.0f} GB/s', flush=True)
    except Exception as e:  # noqa: BLE001
      print(f'{label:28s} FAILED: {type(e).__name__}: {str(e)[:140]}',
            flush=True)

  for bb in (4, 8):
    run(f'dma_floor bb={bb}',
        lambda q_, kq_, vq_, bb=bb: dma_floor(
            q_, kq_, vq_, bb=bb, interpret=not on_tpu),
        (kq, vq))

  for compute in ('f32', 'int8', 'bf16'):
    for bb in (4, 8):
      run(f'lengths {compute} bb={bb}',
          lambda q_, kq_, vq_, l_, compute=compute, bb=bb:
          pa.decode_attention_int8_lengths(
              q_, kq_, vq_, 0.06, 0.06, l_, compute=compute,
              batch_block=bb, interpret=not on_tpu),
          (kq, vq, lengths))

  # Numerics cross-check of the fastest non-floor variant vs f32.
  ref = np.asarray(pa.decode_attention_int8_lengths(
      q, kq, vq, 0.06, 0.06, lengths, interpret=not on_tpu))
  for compute in ('int8', 'bf16'):
    out = np.asarray(pa.decode_attention_int8_lengths(
        q, kq, vq, 0.06, 0.06, lengths, compute=compute,
        interpret=not on_tpu))
    err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9))
    print(f'rel_err {compute} vs f32: {err:.3e}', flush=True)


if __name__ == '__main__':
  main()
