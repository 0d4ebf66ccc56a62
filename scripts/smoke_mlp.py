"""TPU smoke + chained A/B: MLP megakernel vs unfused kernel chain.

Run from repo root: python scripts/smoke_mlp.py
"""

import sys
import time

sys.path.insert(0, '.')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ai_edge_quantizer_tpu.kernels import pallas_mlp, pallas_qmatmul as pq  # noqa: E402


def sync(x):
  return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def main():
  rng = np.random.default_rng(0)
  m, d, f = 256, 2048, 16384
  bf = int(sys.argv[1]) if len(sys.argv) > 1 else 512
  x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
  wgu = rng.integers(-8, 8, (2 * f, d)).astype(np.int8)
  wd = rng.integers(-8, 8, (d, f)).astype(np.int8)
  sgu = jnp.asarray(np.full(2 * f, 0.01, np.float32))
  sd = jnp.asarray(np.full(d, 0.01, np.float32))
  packed_gu = pq.pack_int4_split(jnp.asarray(wgu))
  grouped_d = pallas_mlp.pack_int4_split_grouped(jnp.asarray(wd), bf)
  packed_d = pq.pack_int4_split(jnp.asarray(wd))

  def fused(c, drq):
    return pallas_mlp.mlp_pallas_int4_packed(
        c, packed_gu, sgu, grouped_d, sd, drq=drq, bf=bf)

  def unfused(c):
    gu = pq.qmatmul_pallas_int4_packed(c, packed_gu, sgu)
    gate, up = gu[:, :f], gu[:, f:]
    h = (jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
         * up.astype(jnp.float32)).astype(jnp.bfloat16)
    return pq.qmatmul_pallas_int4_packed(h, packed_d, sd)

  t0 = time.time()
  y_f = fused(x, True)
  y_f.block_until_ready()
  print(f'fused drq compile+run: {time.time()-t0:.1f}s')
  y_u = unfused(x)
  err = float(jnp.linalg.norm((y_f - y_u).astype(jnp.float32))
              / jnp.linalg.norm(y_u.astype(jnp.float32)))
  print(f'rel err fused-drq vs unfused-bf16: {err:.4f}')

  def chained(fn, steps=32):
    def body(c, _):
      y = fn(c)
      return (x + y * 1e-6).astype(x.dtype), None
    return jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=steps)[0])

  steps = 32
  for name, fn in (
      ('unfused bf16  ', unfused),
      ('fused drq     ', lambda c: fused(c, True)),
      ('fused bf16    ', lambda c: fused(c, False)),
  ):
    loop = chained(fn, steps)
    sync(loop(x))
    best = 1e9
    for _ in range(2):
      t0 = time.time()
      sync(loop(x))
      best = min(best, time.time() - t0)
    per = best / steps
    gflops = 2 * m * f * d * 3 / per / 1e9
    print(f'{name}: {per*1e6:.0f} us/layer-mlp  {gflops:.0f} GFLOP/s')


if __name__ == '__main__':
  main()
