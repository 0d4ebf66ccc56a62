"""Microbench: tile-size sweeps for the decode hot kernels.

Times head_argmax_pallas (vocab-tile bn sweep), mlp_pallas_int4_packed
(F-tile bf sweep) and decode_attention_int8_lengths (batch_block sweep)
standalone at the gemma2b bench shapes, chained in one scan per config
so per-dispatch overhead doesn't pollute the numbers.

Env: AEQT_TUNE_ITERS (default 32).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
if os.environ.get('JAX_PLATFORMS'):
  jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
try:
  jax.config.update('jax_compilation_cache_dir', '/tmp/aeqt_xla_cache')
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:  # noqa: BLE001
  pass
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.kernels import pallas_attention  # noqa
from ai_edge_quantizer_tpu.kernels import pallas_head  # noqa
from ai_edge_quantizer_tpu.kernels import pallas_mlp  # noqa
from ai_edge_quantizer_tpu.kernels import pallas_qmatmul  # noqa

ITERS = int(os.environ.get('AEQT_TUNE_ITERS', '32'))
B, D, F, V, S, H, G = 256, 2048, 16384, 256128, 1024, 256, 8


def timeit(make_step, x0, *ops):
  """Chained scan: each iter consumes the previous output.

  Operands ride as jit ARGUMENTS (closure-captured device arrays embed
  as HLO constants — a 0.5 GiB compile payload overflows the tunnel's
  remote-compile request limit). Sync = value fetch: block_until_ready
  has been observed returning early on the axon backend.
  """
  def chunk(x, *ops_):
    def body(c, _):
      return make_step(c, *ops_), None
    return jax.lax.scan(body, x, None, length=ITERS)[0]
  jc = jax.jit(chunk)

  def sync(o):
    return float(jnp.sum(jnp.abs(o).astype(jnp.float32)))
  out = jc(x0, *ops)
  sync(out)
  t0 = time.perf_counter()
  sync(out)
  fetch = time.perf_counter() - t0
  t0 = time.perf_counter()
  out = jc(x0, *ops)
  sync(out)
  return max(time.perf_counter() - t0 - fetch, 1e-9) / ITERS


def main():
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4 = jax.random.split(key, 4)

  # ---- head argmax: int8 embedding head [V, D], bn sweep ----
  w8 = jax.random.randint(k1, (V, D), -127, 127, jnp.int8)
  sc = jnp.full((V,), 0.01, jnp.float32)
  x0 = jax.random.normal(k2, (B, D), jnp.bfloat16)
  gb = V * D / 1e9
  tflop = 2 * B * V * D / 1e12
  for bn in ([] if os.environ.get('AEQT_TUNE_SKIP_HEAD') else (512, 1024, 2048)):
    def step(x, w, s, bn=bn):
      idx = pallas_head.head_argmax_pallas(
          x, w, s, packed=False, true_n=V, bn=bn)
      # feed something token-dependent back so nothing hoists
      return x + (idx[:, None].astype(jnp.bfloat16) * 1e-9)
    dt = timeit(step, x0, w8, sc)
    print(f'head bn={bn:5d}: {dt*1e3:7.3f} ms  {gb/dt:6.0f} GB/s  '
          f'{tflop/dt:6.1f} TOPS ({tflop/dt/394*100:4.1f}% peak)',
          flush=True)

  # ---- MLP megakernel: bf sweep ----
  wq = jax.random.randint(k3, (2 * F, D), -7, 8, jnp.int8)
  wgu = pallas_qmatmul.pack_int4_split(wq)
  sgu = jnp.full((2 * F,), 0.01, jnp.float32)
  wdq = jax.random.randint(k4, (D, F), -7, 8, jnp.int8)
  sd = jnp.full((D,), 0.01, jnp.float32)
  tflop_mlp = 2 * B * 3 * D * F / 1e12
  gb_mlp = (2 * F * D // 2 + D * F // 2) / 1e9
  for bf in (512, 1024):
    wd = pallas_mlp.pack_int4_split_grouped(wdq, bf)
    def step(x, wgu_, sgu_, wd_, sd_, bf=bf):
      return pallas_mlp.mlp_pallas_int4_packed(
          x, wgu_, sgu_, wd_, sd_, act='gelu', drq=True, bf=bf) * 0.5 + x
    dt = timeit(step, x0, wgu, sgu, wd, sd)
    print(f'mlp  bf={bf:5d}: {dt*1e3:7.3f} ms  {gb_mlp/dt:6.0f} GB/s  '
          f'{tflop_mlp/dt:6.1f} TOPS ({tflop_mlp/dt/394*100:4.1f}% peak)',
          flush=True)

  # ---- attention: bb sweep ----
  kq = jax.random.randint(k1, (B, 1, S, H), -127, 127, jnp.int8)
  vq = jax.random.randint(k2, (B, 1, S, H), -127, 127, jnp.int8)
  lens = jnp.full((B,), S - 64, jnp.int32)
  q0 = jax.random.normal(k3, (B, 1, G, H), jnp.float32)
  gb_attn = 2 * B * S * H / 1e9
  for bb in (4, 8):
    def step(q, kq_, vq_, lens_, bb=bb):
      o = pallas_attention.decode_attention_int8_lengths(
          q, kq_, vq_, 0.06, 0.06, lens_, batch_block=bb)
      return q * 0.5 + o * 1e-3
    dt = timeit(step, q0, kq, vq, lens)
    print(f'attn bb={bb:5d}: {dt*1e3:7.3f} ms  {gb_attn/dt:6.0f} GB/s',
          flush=True)


if __name__ == '__main__':
  main()
