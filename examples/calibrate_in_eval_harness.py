"""Calibrate inside an EXISTING evaluation harness (drop-in runner).

The reference wraps its TFLite interpreter so an external eval harness can
run the model normally while calibration statistics accumulate as a side
effect (ref `calibrator.py:72-188`, CalibrationInterpreter /
CalibrationSignatureRunner). The analog here is
`Calibrator.signature_runner`: a callable with the plain inference
contract ({input_name: array} -> {output_name: array}) that updates QSVs
on every call — hand it to any harness that expects "a model".

This example builds a small CNN, "evaluates" it inside a toy harness that
only knows how to call a model function, then quantizes static a8w8 from
the QSVs the harness run left behind — no separate calibration pass.

Run: python examples/calibrate_in_eval_harness.py  (CPU, a few seconds)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests'))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

from ai_edge_quantizer_tpu import Quantizer  # noqa: E402
from ai_edge_quantizer_tpu.pipeline import calibrator as calibrator_lib  # noqa: E402
from ai_edge_quantizer_tpu.recipe import recipe_utils  # noqa: E402
import fixtures  # noqa: E402


def external_eval_harness(model_fn, dataset, input_name) -> float:
  """A third-party eval loop: knows nothing about quantization."""
  correct = 0
  for image, label in dataset:
    out = model_fn({input_name: image})
    pred = int(np.argmax(next(iter(out.values()))))
    correct += int(pred == label)
  return correct / len(dataset)


def main():
  graph = fixtures.conv_fc_mnist()
  sig_key = graph.signatures[0].signature_key
  input_name = next(iter(graph.signatures[0].inputs))

  # 1. Wrap the float model in a calibrating runner.
  from ai_edge_quantizer_tpu.recipe import recipe_manager as rm
  manager = rm.RecipeManager()
  manager.load_quantization_recipe(
      recipe_utils.resolve_recipe('default_a8w8'))
  calib = calibrator_lib.Calibrator(graph)
  runner = calib.signature_runner(sig_key, manager)

  # 2. Run the EXISTING harness with the runner as the model. QSVs
  #    accumulate as a side effect of normal inference.
  rng = np.random.default_rng(0)
  dataset = [(rng.random((1, 28, 28, 1), np.float32), rng.integers(0, 10))
             for _ in range(16)]
  acc = external_eval_harness(runner, dataset, input_name)
  print(f'harness float accuracy (random data): {acc:.2f}')
  print(f'samples calibrated: {calib.get_num_samples_calibrated()}')

  # 3. Quantize straight from the harness run's statistics.
  qt = Quantizer(graph, 'default_a8w8')
  result = qt.quantize(calib.get_model_qsvs())
  cmp = qt.validate(
      {sig_key: [{input_name: img} for img, _ in dataset[:4]]}
  ).get_signature_comparison_result(sig_key)
  worst = max(cmp.output_tensors.values())
  print(f'quantized: output MSE vs float = {worst:.2e}')
  assert result.quantized_model is not None and worst < 1e-2
  print('OK: external-harness calibration -> static quantization works.')


if __name__ == '__main__':
  main()
