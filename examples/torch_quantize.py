"""Example: quantize a PyTorch model directly (torch -> Graph IR -> int8).

The analog of the reference's torch_convert_and_quantize colab, without
the ai-edge-torch/.tflite round trip.

Run: python examples/torch_quantize.py
"""

import numpy as np
import torch
import torch.nn as nn

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.graph import torch_import


def main():
  torch.manual_seed(0)
  model = nn.Sequential(
      nn.Conv2d(1, 8, 3, stride=2, padding=1), nn.ReLU(),
      nn.Conv2d(8, 16, 3, stride=2, padding=1), nn.ReLU(),
      nn.Flatten(), nn.Linear(16 * 7 * 7, 10), nn.Softmax(dim=-1),
  ).eval()

  graph = torch_import.convert_torch_module(model, (1, 28, 28, 1))
  qt = Quantizer(graph, 'dynamic_wi8_afp32')
  result = qt.quantize()
  comparison = qt.validate(num_samples=4)
  sig = graph.signatures[0].signature_key
  r = comparison.get_signature_comparison_result(sig)
  print('per-output mse vs float:', r.output_tensors)
  result.save('/tmp', 'torch_mnist_int8')
  print('saved /tmp/torch_mnist_int8.aeqg')


if __name__ == '__main__':
  main()
