"""Model-level KV-cache quantization quality study.

Trains a small byte-level decoder-only transformer (the models/gemma.py
architectural family: RMSNorm, RoPE, GQA, GeGLU, tied embedding head) on
this repository's own source text, then measures the logit-level impact
of KV-cache quantization schemes on the TRAINED model:

  float          no cache quantization (baseline)
  int8_static    per-tensor scale = calib absmax/127 (the calibrated
                 int8-cache recipe flow, stamp_int8_kv_cache analog)
  int8_pertoken  per-written-row dynamic scales, absmax/127
  int4_pertoken  kernels.pallas_attention.quantize_kv_rows_int4 semantics:
                 per-row absmax/7, clip [-8, 7], bf16 sidecar scales
  k8v4 / k4v8    mixed-precision K vs V variants

Why teacher-forced full-sequence eval is exact: the per-token cache scale
depends only on the row being written, never on the querying position, so
causal attention over per-token-quantized K/V matrices computes the same
logits an incremental decode over the quantized cache would. One forward
pass per scheme gives the decode-time numbers.

Metrics per scheme, on held-out text: NLL (nats/byte), delta vs float,
top-1 next-byte agreement with the float model, mean KL(float || scheme).

This study is the model-level evidence ROUND3_NOTES.md said was missing
for the int4-KV serving decision (gaussian-data relative error is not a
statement about end quality). Reference has no counterpart (it never
executes GenAI models); the closest seam is its KV-cache calibration
alignment, utils/calibration_utils.py:261-372.

Usage:
  python scripts/kv_quality_eval.py                 # TPU if available
  python scripts/kv_quality_eval.py --steps 200 --dim 128 --cpu  # smoke
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def load_corpus(root: str = '/root/repo') -> np.ndarray:
  """Byte corpus: every .py/.md file in the repo (~2 MB of real text)."""
  chunks = []
  for dirpath, dirnames, filenames in os.walk(root):
    dirnames[:] = [d for d in dirnames
                   if d not in ('.git', '__pycache__', 'build', '.ipynb')]
    for fn in sorted(filenames):
      if fn.endswith(('.py', '.md')):
        try:
          with open(os.path.join(dirpath, fn), 'rb') as f:
            chunks.append(f.read())
        except OSError:
          pass
  data = b'\n'.join(chunks)
  return np.frombuffer(data, np.uint8).copy()


# ---------------------------------------------------------------------------
# Model: pure-JAX decoder, same family as models/gemma.py.
# ---------------------------------------------------------------------------


def init_params(rng: np.random.Generator, cfg) -> dict:
  d, f, nq, nk, h = cfg.dim, cfg.ffn, cfg.nq, cfg.nk, cfg.hd

  def w(shape, fan_in):
    return (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)

  params = {'embed': (rng.standard_normal((256, d)) * 0.02).astype(np.float32)}
  for i in range(cfg.layers):
    params[f'l{i}'] = {
        'attn_norm': np.ones((d,), np.float32),
        'mlp_norm': np.ones((d,), np.float32),
        'wq': w((d, nq * h), d),
        'wk': w((d, nk * h), d),
        'wv': w((d, nk * h), d),
        'wo': w((nq * h, d), nq * h),
        'wgate': w((d, f), d),
        'wup': w((d, f), d),
        'wdown': w((f, d), f),
    }
  params['final_norm'] = np.ones((d,), np.float32)
  return params


def make_model(cfg):
  import jax
  import jax.numpy as jnp

  d, nq, nk, h = cfg.dim, cfg.nq, cfg.nk, cfg.hd

  def rms_norm(x, g):
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + 1e-6) * g

  def rope(x, pos):
    # x [B, S, N, H]; rotate-half pairing matching models/gemma.py.
    half = h // 2
    freqs = (10000.0 ** (-jnp.arange(half, dtype=jnp.float32) / half))
    ang = pos[:, None].astype(jnp.float32) * freqs[None, :]  # [S, half]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)

  def forward(params, tokens, kv_qdq=None, matmul_tap=None):
    """tokens [B, S] -> logits [B, S, 256].

    kv_qdq: optional fn (k, v) -> (k, v) applied to the post-RoPE cache
    contents [B, S, NK, H] — the quantize/dequantize cache emulation.
    matmul_tap: optional fn (layer, weight_name, x_2d) recording each FC
    input (GPTQ Hessian capture for the weight-quality study).
    """
    b, s = tokens.shape
    pos = jnp.arange(s)
    x = params['embed'][tokens] * jnp.sqrt(float(d))
    causal = pos[None, :] <= pos[:, None]  # [S, S] lower-triangular

    def tap(i, name, val):
      if matmul_tap is not None:
        matmul_tap(i, name, val.reshape(-1, val.shape[-1]))

    for i in range(cfg.layers):
      lp = params[f'l{i}']
      xa = rms_norm(x, lp['attn_norm'])
      tap(i, 'wq', xa)  # same input feeds wq/wk/wv
      q = rope((xa @ lp['wq']).reshape(b, s, nq, h), pos)
      k = rope((xa @ lp['wk']).reshape(b, s, nk, h), pos)
      v = (xa @ lp['wv']).reshape(b, s, nk, h)
      if kv_qdq is not None:
        k, v = kv_qdq(k, v)
      g = nq // nk
      kx = jnp.repeat(k, g, axis=2)
      vx = jnp.repeat(v, g, axis=2)
      scores = jnp.einsum('bqnh,bknh->bnqk', q, kx) / jnp.sqrt(float(h))
      scores = jnp.where(causal[None, None], scores, -1e30)
      probs = jax.nn.softmax(scores, axis=-1)
      ctx = jnp.einsum('bnqk,bknh->bqnh', probs, vx).reshape(b, s, nq * h)
      tap(i, 'wo', ctx)
      x = x + ctx @ lp['wo']
      xm = rms_norm(x, lp['mlp_norm'])
      tap(i, 'wgate', xm)  # wgate and wup share this input
      gated = jax.nn.gelu(xm @ lp['wgate']) * (xm @ lp['wup'])
      tap(i, 'wdown', gated)
      x = x + gated @ lp['wdown']
    x = rms_norm(x, params['final_norm'])
    return x @ params['embed'].T

  return forward


# ---------------------------------------------------------------------------
# KV quantize/dequantize emulations. Scale handling matches the shipped
# kernels bit-exactly (f32 quantize scale, bf16 sidecar dequant); one known
# divergence remains: the kernels run score/context matmuls in bf16 while
# this study evaluates in f32, so reported deltas exclude bf16 matmul
# rounding (~1e-3 relative), which applies equally to every scheme.
# ---------------------------------------------------------------------------


def _hadamard(n: int) -> np.ndarray:
  assert n & (n - 1) == 0, (
      f'head_dim {n} is not a power of two; the *_had schemes need one '
      '(the shipped HADAMARD_ROTATION op is block-diagonal instead)')
  h = np.array([[1.0]], np.float32)
  while h.shape[0] < n:
    h = np.block([[h, h], [h, -h]])
  return (h / np.sqrt(n)).astype(np.float32)


def make_qdq_fns(calib_absmax_k, calib_absmax_v, head_dim: int):
  import jax.numpy as jnp

  had = jnp.asarray(_hadamard(head_dim))  # symmetric orthonormal: H⁻¹ = H

  def qdq_row(x, qmax_div, group=None):
    """Per-row (token) dynamic symmetric quantization over H.

    group: optional scale-group size along H (per-group sidecar scales);
    None = one scale per row (the shipped int4 kernel's layout).
    Kernel-exact scale handling (quantize_kv_rows_int4): the QUANTIZE
    divides by the f32 scale; the DEQUANTIZE multiplies by the bf16
    sidecar value.
    """
    if group:
      xg = x.reshape(*x.shape[:-1], x.shape[-1] // group, group)
      out = qdq_row(xg, qmax_div)
      return out.reshape(x.shape)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-9) / qmax_div
    lo = -qmax_div - 1 if qmax_div == 7.0 else -qmax_div
    q = jnp.clip(jnp.round(x / scale), lo, qmax_div)
    if qmax_div == 7.0:  # int4 sidecar scales are stored bf16
      scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
    return q * scale

  def qdq_row_asym(x, group, num_bits=4):
    """Per-group ASYMMETRIC quantization (uint levels + bf16 scale/zero).

    The int4-K candidate VERDICT r3 item 8 asks for: K rows are strongly
    non-zero-centered post-RoPE, so an asymmetric grid spends all 16
    levels on the observed span.
    """
    levels = float(2 ** num_bits - 1)
    xg = x.reshape(*x.shape[:-1], x.shape[-1] // group, group)
    mn = jnp.min(xg, axis=-1, keepdims=True)
    mx = jnp.max(xg, axis=-1, keepdims=True)
    scale = jnp.maximum(mx - mn, 1e-9) / levels
    q = jnp.clip(jnp.round((xg - mn) / scale), 0.0, levels)
    scale_b = scale.astype(jnp.bfloat16).astype(jnp.float32)
    mn_b = mn.astype(jnp.bfloat16).astype(jnp.float32)
    return (q * scale_b + mn_b).reshape(x.shape)

  def qdq_rot(x, qmax_div, group=None):
    """Quantize in the Hadamard-rotated basis (QuaRot-style).

    q·(H qdq(Hᵀx)) == (Hᵀq)·qdq(Hᵀx), so rotating-quantizing-rotating-back
    here is EXACTLY what a kernel storing rotated int4 rows and rotating q
    once per step computes. V's rotation is absorbable into wo offline.
    """
    return qdq_row(x @ had, qmax_div, group) @ had

  def qdq_static(x, scale):
    return jnp.clip(jnp.round(x / scale), -127, 127) * scale

  # stamp_int8_kv_cache applies ONE shared scale to both K and V; mirror
  # that exactly (separately-calibrated scales would flatter the scheme).
  shared = jnp.maximum(calib_absmax_k, calib_absmax_v) / 127.0
  g4 = max(8, head_dim // 8)  # per-group(32) at Gemma's H=256
  g16 = min(16, head_dim)
  return {
      'float': None,
      'int8_static': lambda k, v: (qdq_static(k, shared),
                                   qdq_static(v, shared)),
      'int8_pertoken': lambda k, v: (qdq_row(k, 127.0), qdq_row(v, 127.0)),
      'int4_pertoken': lambda k, v: (qdq_row(k, 7.0), qdq_row(v, 7.0)),
      'k8v4': lambda k, v: (qdq_row(k, 127.0), qdq_row(v, 7.0)),
      'k4v8': lambda k, v: (qdq_row(k, 7.0), qdq_row(v, 127.0)),
      'int4_group': lambda k, v: (qdq_row(k, 7.0, g4), qdq_row(v, 7.0, g4)),
      'int4_had': lambda k, v: (qdq_rot(k, 7.0), qdq_rot(v, 7.0)),
      'int4_had_group': lambda k, v: (qdq_rot(k, 7.0, g4),
                                      qdq_rot(v, 7.0, g4)),
      'k8v4_had': lambda k, v: (qdq_row(k, 127.0), qdq_rot(v, 7.0)),
      # VERDICT r3 item 8 candidate: per-group-16 asymmetric K, per-group
      # symmetric V — all int4 storage. int4_g16_symk isolates the
      # asymmetry effect at the SAME group size.
      'int4_g16_asymk': lambda k, v: (qdq_row_asym(k, g16),
                                      qdq_row(v, 7.0, g16)),
      'int4_g16_symk': lambda k, v: (qdq_row(k, 7.0, g16),
                                     qdq_row(v, 7.0, g16)),
      'k4asym_v8': lambda k, v: (qdq_row_asym(k, g16), qdq_row(v, 127.0)),
  }


# ---------------------------------------------------------------------------


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--steps', type=int, default=2500)
  ap.add_argument('--dim', type=int, default=256)
  ap.add_argument('--layers', type=int, default=4)
  ap.add_argument('--heads', type=int, default=8)
  ap.add_argument('--kv-heads', type=int, default=4)
  ap.add_argument('--ffn', type=int, default=1024)
  ap.add_argument('--seq', type=int, default=256)
  ap.add_argument('--batch', type=int, default=64)
  ap.add_argument('--lr', type=float, default=3e-3)
  ap.add_argument('--cpu', action='store_true')
  ap.add_argument('--out', default='/root/repo/KV_QUALITY_r04.json')
  args = ap.parse_args()
  if args.cpu:
    os.environ['JAX_PLATFORMS'] = 'cpu'

  import jax
  if args.cpu:
    # The axon TPU plugin ignores the env var; force the config flag too.
    jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  import optax

  class Cfg:
    dim, layers, nq, nk, ffn, seq = (args.dim, args.layers, args.heads,
                                     args.kv_heads, args.ffn, args.seq)
    hd = args.dim // args.heads
  cfg = Cfg()

  data = load_corpus()
  split = int(len(data) * 0.9)
  train, held = data[:split], data[split:]
  print(f'corpus: {len(data)/1e6:.2f} MB bytes, backend={jax.default_backend()}')

  rng = np.random.default_rng(0)
  params = jax.device_put(init_params(rng, cfg))
  forward = make_model(cfg)

  def loss_fn(p, tokens):
    logits = forward(p, tokens[:, :-1])
    tgt = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
    return jnp.mean(nll)

  warmup = min(100, max(1, args.steps // 10))
  sched = optax.warmup_cosine_decay_schedule(
      0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps)
  opt = optax.adamw(sched, weight_decay=1e-4)
  opt_state = opt.init(params)

  @jax.jit
  def train_step(p, s, tokens):
    l, grads = jax.value_and_grad(loss_fn)(p, tokens)
    updates, s = opt.update(grads, s, p)
    return optax.apply_updates(p, updates), s, l

  # Corpus lives on device; batches are gathered there (one small host
  # transfer total — the tunnel's bulk host->device path is unreliable).
  dev_src = {}

  def sample_batch(src, n, seq, g):
    key = id(src)
    if key not in dev_src:
      dev_src[key] = jnp.asarray(src.astype(np.int32))
    starts = jnp.asarray(g.integers(0, len(src) - seq - 1, n), jnp.int32)
    idx = starts[:, None] + jnp.arange(seq + 1, dtype=jnp.int32)[None, :]
    return jnp.take(dev_src[key], idx, axis=0)

  if args.steps < 1:
    raise SystemExit('--steps must be >= 1 (the study needs a trained model)')
  t0 = time.time()
  g = np.random.default_rng(1)
  for step in range(args.steps):
    batch = jnp.asarray(sample_batch(train, args.batch, args.seq, g))
    params, opt_state, l = train_step(params, opt_state, batch)
    if step % 250 == 0 or step == args.steps - 1:
      print(f'step {step}: loss {float(l):.4f} ({time.time()-t0:.0f}s)')

  # --- Evaluation on held-out text -----------------------------------------
  g = np.random.default_rng(2)
  eval_tokens = jnp.asarray(sample_batch(held, 64, args.seq, g))
  inp, tgt = eval_tokens[:, :-1], eval_tokens[:, 1:]

  # Calibration absmax for the static-int8 scheme: post-RoPE K/V absmax
  # over a calibration batch (the calibrated recipe-flow analog). One
  # global max over layers — matches stamp_int8_kv_cache's single scale.
  absmax = {'k': 0.0, 'v': 0.0}

  def record_absmax(k, v):
    absmax['k'] = max(absmax['k'], float(jnp.max(jnp.abs(k))))
    absmax['v'] = max(absmax['v'], float(jnp.max(jnp.abs(v))))
    return k, v

  calib = jnp.asarray(sample_batch(train, 8, args.seq, g))
  with jax.disable_jit():  # host callback-free absmax capture
    forward(params, calib[:, :-1], kv_qdq=record_absmax)
  print(f'calib absmax: k={absmax["k"]:.3f} v={absmax["v"]:.3f}')

  qdq = make_qdq_fns(jnp.float32(absmax['k']), jnp.float32(absmax['v']),
                     cfg.hd)

  @functools.partial(jax.jit, static_argnames='scheme')
  def eval_scheme(p, inp, scheme):
    return forward(p, inp, kv_qdq=qdq[scheme])

  float_logits = eval_scheme(params, inp, 'float')
  float_logp = jax.nn.log_softmax(float_logits, axis=-1)
  float_top1 = jnp.argmax(float_logits, axis=-1)
  # Skip the first 8 positions (trivially short context).
  sl = slice(8, None)

  results = {}
  for scheme in qdq:
    logits = eval_scheme(params, inp, scheme)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = float(jnp.mean(
        -jnp.take_along_axis(logp[:, sl], tgt[:, sl, None], axis=-1)))
    agree = float(jnp.mean(
        (jnp.argmax(logits, -1) == float_top1)[:, sl]))
    kl = float(jnp.mean(jnp.sum(
        jnp.exp(float_logp[:, sl]) * (float_logp[:, sl] - logp[:, sl]), -1)))
    results[scheme] = {'nll': round(nll, 5), 'top1_agree': round(agree, 5),
                       'mean_kl': round(kl, 6)}
    print(f'{scheme:14s} nll={nll:.4f} top1_agree={agree:.4f} kl={kl:.2e}')

  base = results['float']['nll']
  for scheme in results:
    results[scheme]['delta_nll'] = round(results[scheme]['nll'] - base, 5)

  out = {
      'model': {'dim': cfg.dim, 'layers': cfg.layers, 'nq': cfg.nq,
                'nk': cfg.nk, 'head_dim': cfg.hd, 'ffn': cfg.ffn,
                'seq': args.seq, 'train_steps': args.steps,
                'corpus_mb': round(len(data) / 1e6, 2)},
      'backend': jax.default_backend(),
      'final_train_loss': round(float(l), 4),
      'schemes': results,
  }
  with open(args.out, 'w') as f:
    json.dump(out, f, indent=1)
  print(f'wrote {args.out}')


if __name__ == '__main__':
  main()
