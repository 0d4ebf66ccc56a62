"""MobileNetV2 integration test (int8 static, the imgs/s benchmark model)."""

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.models import mobilenet
from ai_edge_quantizer_tpu.utils import test_data as tdl


def test_mobilenet_a8w8_full_pipeline():
  g = mobilenet.build_mobilenet_v2(batch=1, image_size=96)
  qt = Quantizer(g, 'default_a8w8')
  cr = qt.calibrate(tdl.create_random_dataset(g, num_samples=4))
  res = qt.quantize(cr)
  sg = res.quantized_model.main_subgraph()
  assert all(t.dtype.startswith('int') for t in sg.tensors)
  cmp = qt.validate(num_samples=2)
  assert cmp.get_all_tensor_results()['probs'] < 1e-3
  _, frac = cmp.get_model_size_reduction()
  assert frac > 0.70
