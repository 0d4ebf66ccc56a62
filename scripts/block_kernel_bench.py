"""A/B: fused decode-block megakernel vs the separate-kernel composition
at the bench shape. Chained scans, value-fetch sync, same phase."""

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

from ai_edge_quantizer_tpu.kernels import (
    pallas_attention, pallas_block, pallas_mlp, pallas_qmatmul)

B, D, F, NQ, H, S = 256, 2048, 16384, 8, 256, 1024
BF = int(os.environ.get('AEQT_BLK_BF', '2048'))
BB = int(os.environ.get('AEQT_BLK_BB', '8'))
RING = int(os.environ.get('AEQT_BLK_RING', '8'))
ITERS = int(os.environ.get('AEQT_BLK_ITERS', '32'))
VMEM = int(os.environ.get('AEQT_VMEM_LIMIT_KIB', '98304'))
KS = VS = 0.06
EPS = 1e-6


def main():
  rng = np.random.default_rng(0)
  key = jax.random.PRNGKey(0)
  ks = jax.random.split(key, 8)
  x0 = jax.random.normal(ks[0], (B, D), jnp.float32) * 0.3
  g1 = jnp.ones((D,), jnp.float32)
  g2 = jnp.ones((D,), jnp.float32)
  wgu_q = jax.random.randint(ks[1], (2 * F, D), -7, 8, jnp.int8)
  wgu = pallas_qmatmul.pack_int4_split(wgu_q)
  sgu = jnp.full((2 * F,), 0.008, jnp.float32)
  wd_q = jax.random.randint(ks[2], (D, F), -7, 8, jnp.int8)
  wd = pallas_mlp.pack_int4_split_grouped(wd_q, BF)
  sd = jnp.full((D,), 0.008, jnp.float32)
  wqkv_q = jax.random.randint(ks[3], ((NQ + 2) * H, D), -7, 8, jnp.int8)
  wqkv = pallas_qmatmul.pack_int4_split(wqkv_q)
  sqkv = jnp.full(((NQ + 2) * H,), 0.008, jnp.float32)
  kc = jax.random.randint(ks[4], (B, S, H), -127, 128, jnp.int8)
  vc = jax.random.randint(ks[5], (B, S, H), -127, 128, jnp.int8)
  pos = S - 64
  lengths = jnp.full((B,), pos + 1, jnp.int32)
  half = H // 2
  freqs = 10000.0 ** (-np.arange(0, half, dtype=np.float32) / half)
  cos = jnp.broadcast_to(jnp.asarray(np.cos(pos * freqs)), (B, half))
  sin = jnp.broadcast_to(jnp.asarray(np.sin(pos * freqs)), (B, half))

  opts = {'xla_tpu_scoped_vmem_limit_kib': VMEM}

  def sync(o):
    return float(jnp.sum(jnp.abs(o).astype(jnp.float32)))

  probe = jnp.zeros((8,), jnp.float32)
  for _ in range(3):
    sync(probe)
  fetch = min((lambda t0: (sync(probe), time.perf_counter() - t0)[1])(
      time.perf_counter()) for _ in range(5))

  def run(label, chunk_fn, *args):
    jc = jax.jit(chunk_fn, compiler_options=opts)
    out = jc(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
      t0 = time.perf_counter()
      out = jc(*args)
      sync(out)
      best = min(best, (time.perf_counter() - t0 - fetch) / ITERS)
    print(f'{label}: {best*1e3:.3f} ms/unit', flush=True)
    return best

  # --- A: merged megakernel ---
  def merged_chunk(x, kc_, vc_):
    def body(c, _):
      ctx, x_ffn, kn, vn = pallas_block.fused_mlp_qkv_attention(
          c, g1, wgu, sgu, wd, sd, g2, wqkv, sqkv, cos, sin, kc_, vc_,
          lengths, KS, VS, KS, VS, NQ, eps=EPS, bf=BF, bb=BB, ring=RING)
      # fold ctx back into the residual so nothing hoists
      return (x_ffn + 1e-3 * ctx.reshape(B, NQ * H)[:, :D]
              + 1e-6 * kn[:, :1].astype(jnp.float32)), None
    return jax.lax.scan(body, x, None, length=ITERS)[0]

  # --- B: separate kernels (current production composition) ---
  def separate_chunk(x, kc_, vc_):
    def body(c, _):
      var = jnp.mean(jnp.square(c), axis=1, keepdims=True)
      xn = c * jax.lax.rsqrt(var + EPS) * g1
      mlp = pallas_mlp.mlp_pallas_int4_packed(
          xn, wgu, sgu, wd, sd, act='gelu', drq=True, bf=min(BF, 512))
      x_ffn = c + mlp
      var2 = jnp.mean(jnp.square(x_ffn), axis=1, keepdims=True)
      xn2 = x_ffn * jax.lax.rsqrt(var2 + EPS) * g2
      qkv = pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
          xn2, wqkv, sqkv)
      q = qkv[:, :NQ * H].reshape(B, NQ, H)
      q1, q2_ = q[..., :half], q[..., half:]
      qr = jnp.concatenate(
          [q1 * cos[:, None] - q2_ * sin[:, None],
           q2_ * cos[:, None] + q1 * sin[:, None]], -1)
      kx = qkv[:, NQ * H:(NQ + 1) * H]
      kr = jnp.concatenate(
          [kx[:, :half] * cos - kx[:, half:] * sin,
           kx[:, half:] * cos + kx[:, :half] * sin], -1)
      vx = qkv[:, (NQ + 1) * H:]
      kn = jnp.clip(jnp.round(kr / KS), -128, 127).astype(jnp.int8)
      vn = jnp.clip(jnp.round(vx / VS), -128, 127).astype(jnp.int8)
      ctx = pallas_attention.decode_attention_int8_lengths_stale(
          qr.reshape(B, 1, NQ, H), kc_.reshape(B, 1, S, H),
          vc_.reshape(B, 1, S, H), KS, VS, lengths,
          kn.reshape(B, 1, 1, H), vn.reshape(B, 1, 1, H),
          batch_block=BB)
      return (x_ffn + 1e-3 * ctx.reshape(B, NQ * H)[:, :D]
              + 1e-6 * kn[:, :1].astype(jnp.float32)), None
    return jax.lax.scan(body, x, None, length=ITERS)[0]

  tb = run('separate (mlp+qkv+rope+attn)', separate_chunk, x0, kc, vc)
  ta = run(f'merged megakernel (bf={BF} bb={BB} ring={RING})',
           merged_chunk, x0, kc, vc)
  print(f'speedup: {tb/ta:.3f}x  ({(tb-ta)*1e3:.3f} ms/unit saved; '
        f'x18 layers = {(tb-ta)*18*1e3:.2f} ms/step)')


if __name__ == '__main__':
  main()
