"""Model-level WEIGHT quantization quality study (VERDICT r3 item 5).

Extends the KV-quality methodology (scripts/kv_quality_eval.py) to the
weight algorithms: trains the same small byte-level decoder LM on this
repo's source text, then quantizes its FC weights int4 with each algorithm
THROUGH THE REPO'S OWN CODE PATHS (min_max / octav / mse /
gptq.apply_gptq with real captured Hessians) and measures end quality:
NLL on held-out text, delta vs float, top-1 agreement, mean KL.

This gives the flagship GPTQ algorithm end-quality evidence the reference
never had (its gptq_test.py only asserts numerics, ref
algorithms/uniform_quantize/gptq.py:175-260 is the parity anchor).

Embeddings stay float in every scheme so the measured delta isolates the
FC-weight algorithms.

Usage:
  python scripts/weight_quality_eval.py                 # TPU if available
  python scripts/weight_quality_eval.py --steps 200 --cpu   # smoke
Writes WEIGHT_QUALITY_r04.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from kv_quality_eval import init_params, load_corpus, make_model  # noqa


WEIGHT_NAMES = ('wq', 'wk', 'wv', 'wo', 'wgate', 'wup', 'wdown')
# Which tapped activation feeds each weight (wq/wk/wv share; wgate/wup too).
HESSIAN_SOURCE = {'wq': 'wq', 'wk': 'wq', 'wv': 'wq', 'wo': 'wo',
                  'wgate': 'wgate', 'wup': 'wgate', 'wdown': 'wdown'}


def quantize_weights(params, scheme: str, hessians=None):
  """Return a params copy with FC weights quantize-dequantized per scheme.

  Weights are stored [in, out] (x @ w); the FC quantization convention is
  [out, in] with quantized_dimension=0, so transpose around the call.
  """
  import dataclasses

  from ai_edge_quantizer_tpu import qtyping
  from ai_edge_quantizer_tpu.algorithms.uniform import (
      gptq, min_max, mse, octav, quant_numerics as qn)
  from ai_edge_quantizer_tpu.graph import ir

  bits = 8 if scheme == 'int8_minmax' else 4
  gran = (qtyping.QuantGranularity.BLOCKWISE_32 if scheme.endswith('_b32')
          else qtyping.QuantGranularity.CHANNELWISE)
  wcfg = qtyping.TensorQuantizationConfig(
      num_bits=bits, symmetric=True, granularity=gran)
  cfg = qtyping.OpQuantizationConfig(weight_tensor_config=wcfg)
  op = ir.Op(opcode='FULLY_CONNECTED', inputs=[0, 1, -1], outputs=[2])
  info = qtyping.OpInfo(op=op, op_name=qtyping.OpName.FULLY_CONNECTED,
                        subgraph_op_index=0, op_quant_config=cfg)

  def qdq(w_io: np.ndarray, layer: int, name: str) -> np.ndarray:
    w = np.asarray(w_io, np.float32).T  # [out, in]
    if scheme in ('int8_minmax', 'int4_minmax', 'int4_minmax_b32'):
      p = min_max.get_tensor_quant_params(info, wcfg, w)
    elif scheme == 'int4_octav':
      p = octav.get_tensor_quant_params(info, wcfg, w)
    elif scheme == 'int4_mse':
      p = mse.get_tensor_quant_params(info, wcfg, w)
    elif scheme in ('int4_gptq', 'int4_gptq_b32'):
      base = min_max.get_tensor_quant_params(info, wcfg, w)
      base = dataclasses.replace(base, quantized_data=None)
      h = hessians[(layer, HESSIAN_SOURCE[name])]
      p = gptq.apply_gptq(w, base, h)
    elif scheme in ('int4_gptq_octav', 'int4_gptq_octav_b32'):
      # OCTAV's clipped scales + GPTQ's Hessian-aware rounding: the
      # weight-quality study showed scale choice dominates the rounding
      # objective; combine the winners.
      base = octav.get_tensor_quant_params(info, wcfg, w)
      base = dataclasses.replace(base, quantized_data=None)
      h = hessians[(layer, HESSIAN_SOURCE[name])]
      p = gptq.apply_gptq(w, base, h)
    else:
      raise ValueError(scheme)
    return qn.dequantize_array(p.quantized_data, p).astype(np.float32).T

  out = dict(params)
  for key in list(out):
    if not key.startswith('l'):
      continue
    lp = dict(out[key])
    layer = int(key[1:])
    for name in WEIGHT_NAMES:
      lp[name] = qdq(np.asarray(lp[name]), layer, name)
    out[key] = lp
  return out


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
  ap.add_argument('--out', default='/root/repo/WEIGHT_QUALITY_r04.json')
  args = ap.parse_args()
  if args.cpu:
    os.environ['JAX_PLATFORMS'] = 'cpu'

  import jax
  if args.cpu:
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
  print(f'corpus: {len(data)/1e6:.2f} MB, backend={jax.default_backend()}')

  rng = np.random.default_rng(0)
  params = jax.device_put(init_params(rng, cfg))
  forward = make_model(cfg)

  def loss_fn(p, tokens):
    logits = forward(p, tokens[:, :-1])
    tgt = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, tgt[..., None], axis=-1))

  if args.steps < 1:
    raise SystemExit('--steps must be >= 1')
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

  t0 = time.time()
  g = np.random.default_rng(1)
  for step in range(args.steps):
    batch = jnp.asarray(sample_batch(train, args.batch, args.seq, g))
    params, opt_state, l = train_step(params, opt_state, batch)
    if step % 250 == 0 or step == args.steps - 1:
      print(f'step {step}: loss {float(l):.4f} ({time.time()-t0:.0f}s)')

  params_np = jax.tree_util.tree_map(np.asarray, params)

  # --- GPTQ Hessian capture: H = 2/n X^T X per tapped FC input ------------
  hessians: dict = {}
  counts: dict = {}

  def tap(layer, name, x2d):
    x = np.asarray(x2d, np.float32)
    key = (layer, name)
    h = hessians.get(key)
    if h is None:
      hessians[key] = x.T @ x
      counts[key] = x.shape[0]
    else:
      hessians[key] = h + x.T @ x
      counts[key] += x.shape[0]

  calib = jnp.asarray(sample_batch(train, 8, args.seq, g))
  with jax.disable_jit():
    forward(params, calib[:, :-1], matmul_tap=tap)
  for key in hessians:
    hessians[key] = (2.0 / counts[key]) * hessians[key]
  print(f'hessians captured: {len(hessians)} '
        f'({counts[(0, "wq")]} rows each)')

  # --- Evaluation ---------------------------------------------------------
  g = np.random.default_rng(2)
  eval_tokens = jnp.asarray(sample_batch(held, 64, args.seq, g))
  inp, tgt = eval_tokens[:, :-1], eval_tokens[:, 1:]

  jit_forward = jax.jit(lambda p, t: forward(p, t))
  float_logits = jit_forward(params, inp)
  float_logp = jax.nn.log_softmax(float_logits, axis=-1)
  float_top1 = jnp.argmax(float_logits, axis=-1)
  sl = slice(8, None)

  schemes = ['float', 'int8_minmax', 'int4_minmax', 'int4_octav',
             'int4_mse', 'int4_gptq', 'int4_gptq_octav',
             'int4_minmax_b32', 'int4_gptq_b32', 'int4_gptq_octav_b32']
  results = {}
  for scheme in schemes:
    t0 = time.time()
    if scheme == 'float':
      qp = params
    else:
      qp = jax.device_put(quantize_weights(params_np, scheme, hessians))
    logits = jit_forward(qp, inp)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = float(jnp.mean(
        -jnp.take_along_axis(logp[:, sl], tgt[:, sl, None], axis=-1)))
    agree = float(jnp.mean((jnp.argmax(logits, -1) == float_top1)[:, sl]))
    kl = float(jnp.mean(jnp.sum(
        jnp.exp(float_logp[:, sl]) * (float_logp[:, sl] - logp[:, sl]), -1)))
    results[scheme] = {'nll': round(nll, 5), 'top1_agree': round(agree, 5),
                       'mean_kl': round(kl, 6)}
    print(f'{scheme:16s} nll={nll:.4f} top1_agree={agree:.4f} '
          f'kl={kl:.2e} ({time.time()-t0:.0f}s)')

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
      'note': 'FC weights only; embeddings float in all schemes. GPTQ '
              'uses captured 2/n X^T X Hessians through '
              'algorithms/uniform/gptq.apply_gptq.',
      'schemes': results,
  }
  with open(args.out, 'w') as f:
    json.dump(out, f, indent=1)
  print(f'wrote {args.out}')


if __name__ == '__main__':
  main()
