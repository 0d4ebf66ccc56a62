"""Example: six ways to quantize an MNIST-class conv/FC model.

Mirrors the reference's examples/mnist walkthrough: programmatic recipes,
advanced PTQ algorithms (OCTAV / MSE), static-range with calibration,
blockwise, Hadamard rotation, and recipe-from-JSON — all on the Graph IR
model built in-process (swap in a .tflite or .aeqg path for real models).

Run: python examples/quantize_mnist_model.py --mode dynamic_int8
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from ai_edge_quantizer_tpu import Quantizer, qtyping  # noqa: E402
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor  # noqa
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder  # noqa: E402
from ai_edge_quantizer_tpu.utils import test_data as tdl  # noqa: E402


def build_mnist_model(seed: int = 0):
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('image', (1, 28, 28, 1))
  h = b.conv2d(x, (rng.standard_normal((8, 3, 3, 1)) * 0.3).astype(
      np.float32), (rng.standard_normal(8) * 0.1).astype(np.float32),
      name='conv1', activation='RELU')
  h = b.op('MAX_POOL_2D', [h], [(1, 14, 14, 8)], output_names=['pool1'],
           attrs={'filter_size': 2, 'stride': 2, 'padding': 'VALID'})
  h = b.op('RESHAPE', [h], [(1, 14 * 14 * 8)], output_names=['flat'],
           attrs={'new_shape': [1, 14 * 14 * 8]})
  h = b.fully_connected(
      h, (rng.standard_normal((64, 14 * 14 * 8)) * 0.05).astype(np.float32),
      (rng.standard_normal(64) * 0.1).astype(np.float32),
      name='fc1', activation='RELU')
  h = b.fully_connected(
      h, (rng.standard_normal((10, 64)) * 0.2).astype(np.float32),
      (rng.standard_normal(10) * 0.1).astype(np.float32), name='fc2')
  y = b.unary('SOFTMAX', h, name='probs')
  b.output(y)
  return b.finalize()


def quantize_dynamic_int8(model):
  """Programmatic recipe: int8 dynamic-range on every supported op."""
  qt = Quantizer(model, 'dynamic_wi8_afp32')
  return qt, qt.quantize()


def quantize_weight_only_int4_octav(model):
  """Advanced PTQ: int4 weight-only with OCTAV optimal clipping."""
  qt = Quantizer(model)
  qt.update_quantization_recipe(
      '.*', 'FULLY_CONNECTED',
      qtyping.OpQuantizationConfig(
          weight_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=4, symmetric=True,
              granularity=qtyping.QuantGranularity.CHANNELWISE),
          compute_precision=qtyping.ComputePrecision.FLOAT,
          explicit_dequantize=True),
      algorithm_key='OCTAV')
  return qt, qt.quantize()


def quantize_static_a8w8(model):
  """Full static-range: calibrate activations, everything integer."""
  qt = Quantizer(model, 'default_a8w8')
  calibration_data = tdl.create_random_dataset(model, num_samples=32)
  qsvs = qt.calibrate(calibration_data)
  return qt, qt.quantize(qsvs)


def quantize_blockwise(model):
  """int4 blockwise-32 weights on the big FC."""
  qt = Quantizer(model)
  qt.add_dynamic_config('fc1.*', 'FULLY_CONNECTED', 4,
                        granularity=qtyping.QuantGranularity.BLOCKWISE_32)
  qt.add_dynamic_config('fc2.*', 'FULLY_CONNECTED', 8)
  return qt, qt.quantize()


def quantize_hadamard(model):
  """int4 with Hadamard rotation (outlier mitigation)."""
  qt = Quantizer(model)
  qt.update_quantization_recipe(
      '.*', 'FULLY_CONNECTED',
      qtyping.OpQuantizationConfig(
          weight_tensor_config=qtyping.TensorQuantizationConfig(
              num_bits=4, symmetric=True,
              granularity=qtyping.QuantGranularity.CHANNELWISE),
          compute_precision=qtyping.ComputePrecision.INTEGER),
      algorithm_key='DECOMPOSED_HADAMARD_ROTATION')
  return qt, qt.quantize()


def quantize_from_json(model):
  """Recipe loaded from a JSON document."""
  recipe = [{
      'regex': '.*',
      'operation': '*',
      'algorithm_key': 'min_max_uniform_quantize',
      'op_config': {
          'weight_tensor_config': {
              'num_bits': 8, 'symmetric': True,
              'granularity': 'CHANNELWISE', 'dtype': 'INT'},
          'compute_precision': 'INTEGER',
          'explicit_dequantize': False,
      },
  }]
  qt = Quantizer(model, recipe)
  return qt, qt.quantize()


MODES = {
    'dynamic_int8': quantize_dynamic_int8,
    'weight_only_int4_octav': quantize_weight_only_int4_octav,
    'static_a8w8': quantize_static_a8w8,
    'blockwise': quantize_blockwise,
    'hadamard': quantize_hadamard,
    'from_json': quantize_from_json,
}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--mode', choices=sorted(MODES), default='dynamic_int8')
  ap.add_argument('--output_dir', default='/tmp/aeqt_example')
  args = ap.parse_args()

  model = build_mnist_model()
  qt, result = MODES[args.mode](model)
  os.makedirs(args.output_dir, exist_ok=True)
  result.save(args.output_dir, f'mnist_{args.mode}', overwrite=True)

  comparison = qt.validate(num_samples=4)
  _, frac = comparison.get_model_size_reduction()
  sig = comparison.available_signature_keys()[0]
  res = comparison.get_signature_comparison_result(sig)
  print(f'mode={args.mode}: size reduction {frac:.1%}')
  print(f'output errors (mse): {res.output_tensors}')

  # Run inference on a random digit through both models.
  rng = np.random.default_rng(7)
  img = {'image': rng.standard_normal((1, 28, 28, 1)).astype(np.float32)}
  float_probs = GraphExecutor(model).signature_runner()(img)
  quant_probs = GraphExecutor(result.quantized_model).signature_runner()(img)
  print('float argmax:', int(np.argmax(list(float_probs.values())[0])),
        'quantized argmax:',
        int(np.argmax(np.asarray(list(quant_probs.values())[0]))))


if __name__ == '__main__':
  main()
