"""Peak sustainable HBM read bandwidth probe: what can ANY kernel get?

Sweeps Pallas block sizes/layouts over a flat multi-GB pool with trivial
compute, chained so XLA cannot hoist. The best number here is the real
denominator for 'how far from speed-of-light is the decode step' — the
819 GB/s spec has never been observed through this part (round-2 flat
probe: ~550 GB/s; attention-pattern floor: ~463 GB/s).
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


def log(*a):
  print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=('block_rows', 'interpret'))
def pallas_read(pool, seed, block_rows=4096, interpret=False):
  """Sum a [R, 1024] int8 pool in [block_rows, 1024] blocks."""
  r, c = pool.shape

  def kernel(s_ref, p_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
      o_ref[0, 0] = 0
    o_ref[0, 0] = (o_ref[0, 0]
                   + jnp.sum(p_ref[:].astype(jnp.int32)) + s_ref[0, 0])

  return pl.pallas_call(
      kernel,
      grid=(r // block_rows,),
      in_specs=[
          pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
          pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
      out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(seed.reshape(1, 1), pool)[0, 0]


def chained(fn, pool, iters=8):
  def run(p, s0):
    def body(carry, _):
      out = fn(p, carry)
      return out % 1024, None
    return jax.lax.scan(body, s0, None, length=iters)[0]

  jitted = jax.jit(run)
  v = int(jitted(pool, jnp.int32(1)))
  t0 = time.perf_counter()
  v = int(jitted(pool, jnp.int32(2)))
  dt = (time.perf_counter() - t0) / iters
  assert v < 1024
  return dt


def main():
  gib = float(os.environ.get('AEQT_PROBE_GIB', '2.0'))
  rows = int(gib * 2**30) // 1024
  rows = rows // 32768 * 32768
  pool = jnp.ones((rows, 1024), jnp.int8)
  nbytes = rows * 1024
  log(f'pool {nbytes/2**30:.2f} GiB; backend={jax.default_backend()}')

  for block_rows in (2048, 4096, 8192, 16384):
    # block bytes = block_rows KiB (1024 int8 cols)
    try:
      dt = chained(functools.partial(pallas_read, block_rows=block_rows),
                   pool)
      print(f'pallas block {block_rows*1024/2**20:6.0f} MiB: '
            f'{nbytes/dt/1e9:6.0f} GB/s ({dt*1e3:.2f} ms/pass)',
            flush=True)
    except Exception as e:  # noqa: BLE001
      print(f'pallas block {block_rows}: FAILED {str(e)[:120]}', flush=True)

  # XLA baseline: carry-dependent slice sum (round-2 methodology).
  def xla_read(p, s0):
    def body(c, _):
      i = c % 8
      sl = jax.lax.dynamic_slice_in_dim(p, i, p.shape[0] - 8, 0)
      return (c + jnp.sum(sl, dtype=jnp.int32)) % 1024, None
    return jax.lax.scan(body, s0, None, length=8)[0]

  jr = jax.jit(xla_read)
  int(jr(pool, jnp.int32(1)))
  t0 = time.perf_counter()
  int(jr(pool, jnp.int32(2)))
  dt = (time.perf_counter() - t0) / 8
  print(f'xla slice-sum        : {nbytes/dt/1e9:6.0f} GB/s '
        f'({dt*1e3:.2f} ms/pass)', flush=True)


if __name__ == '__main__':
  main()
