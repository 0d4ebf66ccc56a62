"""TPU smoke + chained-scan A/B: int4-packed DRQ (int8 MXU) vs bf16 kernel.

Run from repo root: python scripts/smoke_drq.py
"""

import sys
import time

sys.path.insert(0, '.')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ai_edge_quantizer_tpu.kernels import pallas_qmatmul as pq  # noqa: E402


def sync(x):
  return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def chained(fn, x0, steps=32):
  """Timing loop with a carry data-dependence (defeats hoisting/CSE)."""

  def body(c, _):
    y = fn(c)
    # Feed a slice of the output back as the next input (shapes differ:
    # re-project y's leading K columns, scaled tiny to avoid overflow).
    c2 = (c + y[:, : c.shape[1]] * 1e-6).astype(c.dtype)
    return c2, None

  return jax.jit(lambda c: jax.lax.scan(body, c, None, length=steps)[0])


def main():
  rng = np.random.default_rng(0)
  m, k = 256, 2048
  n = 32768  # gate_up-shaped: the biggest per-layer matmul
  x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
  w = rng.integers(-8, 8, (n, k)).astype(np.int8)
  s = jnp.asarray(np.full(n, 0.01, np.float32))
  packed = pq.pack_int4_split(jnp.asarray(w))

  y_bf = pq.qmatmul_pallas_int4_packed(x, packed, s)
  y_dr = pq.qmatmul_pallas_int4_packed_drq(x, packed, s)
  err = float(jnp.linalg.norm((y_dr - y_bf).astype(jnp.float32))
              / jnp.linalg.norm(y_bf.astype(jnp.float32)))
  print(f'rel err drq vs weight-only: {err:.4f}')

  steps = 32
  for name, fn in (
      ('bf16 ', lambda c: pq.qmatmul_pallas_int4_packed(c, packed, s)),
      ('drq  ', lambda c: pq.qmatmul_pallas_int4_packed_drq(c, packed, s)),
  ):
    loop = chained(fn, x, steps)
    sync(loop(x))  # compile
    t0 = time.time()
    sync(loop(x))
    dt = time.time() - t0
    t0 = time.time()
    sync(loop(x))
    rt = time.time() - t0  # second run: subtract ~fetch cost via min
    per = min(dt, rt) / steps
    gflops = 2 * m * n * k / per / 1e9
    print(f'{name}: {per*1e6:.0f} us/call  {gflops:.0f} GFLOP/s')


if __name__ == '__main__':
  main()
