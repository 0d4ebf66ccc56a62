"""Microbenchmark: qmatmul variants on the decode-shape hot case.

Run on TPU: python scripts/microbench_qmatmul.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')

from ai_edge_quantizer_tpu.kernels import pallas_qmatmul, qmatmul  # noqa: E402


def _sync(out):
  # Value fetch: block_until_ready is unreliable over the axon tunnel.
  return float(jnp.sum(jnp.abs(out).astype(jnp.float32)))


def timeit(fn, *args, iters=50, min_device_s=0.05):
  """On-device scan loop: per-dispatch tunnel latency would otherwise
  swamp kernels in the 10-100us range. The carry ties iterations into a
  dependency chain so XLA cannot elide or overlap them. The iteration
  count adapts until total device work >= min_device_s — totals below the
  tunnel's ~30 ms round-trip noise floor measure as garbage (an early run
  printed 0.0 us for a ~35 us kernel at iters=50)."""

  def measure(n_iters):
    def body(carry, _):
      out = fn(carry[0], *args[1:])
      eps = (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(carry[0].dtype)
      return (carry[0] + eps, carry[1] + 1), ()

    run = jax.jit(lambda x0: jax.lax.scan(
        body, (x0, jnp.int32(0)), None, length=n_iters)[0][0])
    _sync(run(args[0]))
    small = jnp.ones((1, 1), jnp.float32)
    _sync(small)
    rts = []
    for _ in range(5):
      t0 = time.perf_counter()
      _sync(small)
      rts.append(time.perf_counter() - t0)
    rt = min(rts)
    t0 = time.perf_counter()
    out = run(args[0])
    _sync(out)
    return max((time.perf_counter() - t0 - rt) / n_iters, 1e-9)

  dt = measure(iters)
  if dt * iters < min_device_s:
    dt = measure(max(iters, int(np.ceil(min_device_s / max(dt, 1e-7)))))
  return dt


def main():
  m, n, k = 8, 16384, 2048
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
  w_q = jnp.asarray(
      rng.integers(-7, 8, size=(n, k)), jnp.int8)
  scale = jnp.asarray(rng.random(n) * 0.01 + 0.001, jnp.float32)
  w_packed = pallas_qmatmul.pack_int4_split(w_q)
  w_bytes_int8 = n * k
  w_bytes_int4 = n * k // 2

  print(f'case: [{m},{k}] x [{n},{k}]^T on {jax.devices()[0]}', flush=True)

  fns = {
      'xla_dequant_einsum': jax.jit(
          lambda x, w, s: qmatmul.qmatmul_ref(x, w, s)),
      'xla_int8_drq': jax.jit(
          lambda x, w, s: qmatmul.drq_matmul_ref(x, w, s)),
      'pallas_int8': jax.jit(
          lambda x, w, s: pallas_qmatmul.qmatmul_pallas(x, w, s)),
      'pallas_int8_drq': jax.jit(
          lambda x, w, s: pallas_qmatmul.qmatmul_pallas_int8_drq(x, w, s)),
  }
  for name, fn in fns.items():
    try:
      dt = timeit(fn, x, w_q, scale)
      gbps = w_bytes_int8 / dt / 1e9
      print(f'{name:22s} {dt*1e6:8.1f} us  {gbps:7.1f} GB/s weight stream',
            flush=True)
    except Exception as e:
      print(f'{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}',
            flush=True)

  try:
    fn4 = jax.jit(lambda x, w, s: pallas_qmatmul.qmatmul_pallas_int4_packed(
        x, w, s))
    dt = timeit(fn4, x, w_packed, scale)
    gbps = w_bytes_int4 / dt / 1e9
    print(f'{"pallas_int4_packed":22s} {dt*1e6:8.1f} us  {gbps:7.1f} GB/s '
          f'weight stream (half bytes)', flush=True)
    # correctness vs reference
    ref = qmatmul.qmatmul_ref(x, w_q, scale)
    got = fn4(x, w_packed, scale)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f'int4 packed max err vs ref: {err:.2e}', flush=True)
  except Exception as e:
    print(f'pallas_int4_packed FAILED: {type(e).__name__}: {str(e)[:300]}',
          flush=True)

  try:
    bs = 128
    scale_b = jnp.asarray(
        rng.random((n, k // bs)) * 0.01 + 0.001, jnp.float32)
    fnb = jax.jit(
        lambda x, w, s: pallas_qmatmul.qmatmul_pallas_int4_packed_blockwise(
            x, w, s, block_size=bs))
    dt = timeit(fnb, x, w_packed, scale_b)
    gbps = w_bytes_int4 / dt / 1e9
    print(f'{"pallas_int4_blockwise":22s} {dt*1e6:8.1f} us  {gbps:7.1f} '
          f'GB/s weight stream (bs={bs})', flush=True)
  except Exception as e:
    print(f'pallas_int4_blockwise FAILED: {type(e).__name__}: '
          f'{str(e)[:300]}', flush=True)

  try:
    gamma = jnp.asarray(rng.random(k) * 0.5 + 0.75, jnp.float32)
    fnn = jax.jit(
        lambda x, g, w, s: pallas_qmatmul.qmatmul_pallas_int4_packed_rmsnorm(
            x, g, w, s))
    dt = timeit(fnn, x, gamma, w_packed, scale)
    gbps = w_bytes_int4 / dt / 1e9
    print(f'{"pallas_int4_rmsnorm":22s} {dt*1e6:8.1f} us  {gbps:7.1f} '
          f'GB/s weight stream (norm fused)', flush=True)
  except Exception as e:
    print(f'pallas_int4_rmsnorm FAILED: {type(e).__name__}: '
          f'{str(e)[:300]}', flush=True)


if __name__ == '__main__':
  main()
