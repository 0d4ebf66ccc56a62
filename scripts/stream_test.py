"""Isolate streaming bandwidth: raw Pallas block streaming vs XLA reduce
vs the XLA attention twin, all chained-scan timed."""

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


def chained(fn, args, iters=64):
  def run(c0, *rest):
    def body(carry, _):
      out = fn(carry, *rest)
      return out, None
    return jax.lax.scan(body, c0, None, length=iters)[0]

  jitted = jax.jit(run)
  v = float(jnp.sum(jnp.abs(jitted(*args).astype(jnp.float32))))
  t0 = time.perf_counter()
  v = float(jnp.sum(jnp.abs(jitted(*args).astype(jnp.float32))))
  assert np.isfinite(v)
  return (time.perf_counter() - t0) / iters


def main():
  b, s, h = 256, 1024, 256
  rng = np.random.default_rng(0)
  kq = jnp.asarray(rng.integers(-127, 128, (b, s, h)), jnp.int8)
  total = b * s * h

  # 1. Pallas stream-sum: per-block row sums only (no MXU, no softmax).
  def make_stream(bb, window=None):
    w = window or s

    def kernel(x_ref, o_ref):
      acc = jnp.zeros((8, 128), jnp.float32)
      for r in range(bb):
        blk = x_ref[r, :w].astype(jnp.float32)
        acc += jnp.sum(blk.reshape(8, -1, 128), axis=1)
      o_ref[0] = acc

    def fn(carry, x):
      out = pl.pallas_call(
          kernel,
          grid=(b // bb,),
          in_specs=[pl.BlockSpec((bb, s, h), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((b // bb, 8, 128), jnp.float32),
      )(x)
      return carry + jnp.sum(out) * 1e-30

    return fn

  for bb in (1, 2, 8):
    dt = chained(make_stream(bb), (jnp.float32(0.0), kq))
    print(f'pallas stream bb={bb}:  {dt*1e6:8.1f} us  '
          f'{total/dt/1e9:7.0f} GB/s', flush=True)

  # 1b. HBM-resident input + manual double-buffered DMA.
  def dma_kernel(x_hbm, o_ref):
    def body(scratch, sem):
      n_chunks = b
      def get(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i, 1)], scratch.at[slot], sem.at[slot])
      get(0, 0).start()
      def loop(i, acc):
        slot = i % 2
        nxt = (i + 1) % 2
        @pl.when(i + 1 < n_chunks)
        def _():
          get(nxt, i + 1).start()
        get(slot, i).wait()
        return acc + jnp.sum(scratch[slot].astype(jnp.float32))
      acc = jax.lax.fori_loop(0, n_chunks, loop, jnp.float32(0.0))
      o_ref[0, 0] = acc

    pl.run_scoped(
        body,
        pltpu.VMEM((2, 1, s, h), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
    )

  def dma_fn(carry, x):
    out = pl.pallas_call(
        dma_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(x)
    return carry + out[0, 0] * 1e-30

  try:
    dt = chained(dma_fn, (jnp.float32(0.0), kq))
    print(f'pallas manual DMA:   {dt*1e6:8.1f} us  '
          f'{total/dt/1e9:7.0f} GB/s', flush=True)
  except Exception as e:
    print(f'manual DMA FAILED: {type(e).__name__}: {str(e)[:200]}',
          flush=True)

  # 2. XLA reduce of the same array.
  def xla_sum(carry, x):
    return carry + jnp.sum(x, dtype=jnp.int32).astype(jnp.float32) * 1e-30

  dt = chained(xla_sum, (jnp.float32(0.0), kq))
  print(f'xla sum:             {dt*1e6:8.1f} us  '
        f'{total/dt/1e9:7.0f} GB/s', flush=True)

  # 3. XLA attention twin (einsum-based, bf16) at the bench shape.
  g = 8
  q = jnp.asarray(rng.standard_normal((b, 1, g, h)), jnp.bfloat16)
  k4 = kq.reshape(b, 1, s, h)
  v4 = kq.reshape(b, 1, s, h)

  def xla_attn(q_, k_, v_):
    scores = jnp.einsum('bngh,bnsh->bngs', q_.astype(jnp.bfloat16),
                        k_.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * 0.06, axis=-1)
    ctx = jnp.einsum('bngs,bnsh->bngh', probs.astype(jnp.bfloat16),
                     v_.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return ctx.astype(jnp.bfloat16)

  dt = chained(lambda q_, k_, v_: xla_attn(q_, k_, v_), (q, k4, v4))
  print(f'xla attention bf16:  {dt*1e6:8.1f} us  '
        f'{2*total/dt/1e9:7.0f} GB/s (K+V)', flush=True)


if __name__ == '__main__':
  main()
