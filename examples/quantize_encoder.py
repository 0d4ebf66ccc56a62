"""Selective quantization of a BERT-class encoder.

Demonstrates the scope-regex recipe workflow on the encoder model family
(the reference's selective-quantization colab use case,
/root/reference/colabs/selective_quantization_isnet.ipynb, applied to a
transformer): MLP projections quantized aggressively with GPTQ int4,
attention projections with OCTAV int8, embeddings int8 min-max, while the
pooler/classifier head stays float for accuracy.

Run: python examples/quantize_encoder.py [--srq]
"""

import argparse

import jax


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--srq', action='store_true',
                      help='fully-integer static-range instead of dynamic')
  parser.add_argument('--device', choices=['cpu', 'tpu'], default='cpu',
                      help='backend to run on (default cpu)')
  args = parser.parse_args()
  if args.device == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

  from ai_edge_quantizer_tpu import Quantizer, qtyping
  from ai_edge_quantizer_tpu.models import encoder
  from ai_edge_quantizer_tpu.utils import test_data as tdl

  cfg = encoder.EncoderConfig(
      vocab_size=2048, seq_len=64, embed_dim=128, num_layers=2,
      num_heads=4, ffn_dim=512, num_classes=4)
  graph = encoder.build_encoder(cfg, batch=4)
  qt = Quantizer(graph)

  def _w(bits):
    return qtyping.OpQuantizationConfig(
        weight_tensor_config=qtyping.TensorQuantizationConfig(
            num_bits=bits, symmetric=True,
            granularity=qtyping.QuantGranularity.CHANNELWISE),
        compute_precision=qtyping.ComputePrecision.INTEGER)

  if args.srq:
    # Whole-graph static int8 baseline, then selective overrides below.
    qt.add_static_config('.*', qtyping.OpName.ALL_SUPPORTED,
                         activation_num_bits=8, weight_num_bits=8)
  else:
    qt.add_dynamic_config('.*', qtyping.OpName.ALL_SUPPORTED, num_bits=8)
  # MLP FCs: GPTQ int4 (calibrated Hessian/OBS solve).
  qt.update_quantization_recipe(
      '.*mlp.*', 'FULLY_CONNECTED', _w(4), algorithm_key='GPTQ')
  # Attention projections: OCTAV int8 (optimal clipping).
  qt.update_quantization_recipe(
      '.*attn.*', 'FULLY_CONNECTED', _w(8), algorithm_key='OCTAV')
  if not args.srq:
    # Keep the small classifier head float: its accuracy matters most and
    # its weights are a rounding error of the model size. Scopes match op
    # OUTPUT tensor names (reference scope semantics), so name the head by
    # its outputs, not its weight tensors. Under a static-range catch-all
    # this override is unavailable (reference parity: graph outputs fed by
    # a no-quantize producer have no QSV, and the virtual OUTPUT op —
    # whose scope is empty, ref tfl_flatbuffer_utils.py:334-338 — still
    # materializes under the '.*' SRQ entry and raises).
    qt.update_quantization_recipe(
        '.*(pooler|logits|probs).*', qtyping.OpName.ALL_SUPPORTED,
        qtyping.OpQuantizationConfig(
            compute_precision=qtyping.ComputePrecision.FLOAT,
            explicit_dequantize=False),
        algorithm_key='no_quantize')

  calibration = None
  if qt.need_calibration:
    data = tdl.create_random_dataset(graph, num_samples=16)
    calibration = qt.calibrate(data)
  result = qt.quantize(calibration)

  sg = result.quantized_model.main_subgraph()
  dtypes = {}
  for t in sg.tensors:
    if t.buffer >= 0 and t.quantization is not None:
      dtypes.setdefault(t.dtype, []).append(t.name)
  for dt, names in sorted(dtypes.items()):
    print(f'{dt}: {len(names)} weights, e.g. {sorted(names)[:3]}')

  comparison = qt.validate(num_samples=4)
  sig = comparison.available_signature_keys()[0]
  res = comparison.get_signature_comparison_result(sig)
  print('output errors:', {k: f'{v:.2e}' for k, v in
                           res.output_tensors.items()})
  size_bytes, reduction = comparison.get_model_size_reduction()
  print(f'size reduction: {reduction:.1%}')


if __name__ == '__main__':
  main()
