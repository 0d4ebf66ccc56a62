"""PyTorch -> Graph IR migration path tests."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402

from ai_edge_quantizer_tpu import Quantizer, qtyping  # noqa: E402
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor  # noqa
from ai_edge_quantizer_tpu.graph import torch_import  # noqa: E402


def _run(graph, inp):
  sig = graph.signatures[0]
  out = GraphExecutor(graph).signature_runner(sig.signature_key)(
      {list(sig.inputs)[0]: inp})
  return np.asarray(list(out.values())[0])


class TestTorchImport:

  def test_mlp_matches_torch(self):
    torch.manual_seed(0)
    m = nn.Sequential(
        nn.Linear(16, 32), nn.ReLU(), nn.Dropout(0.5),
        nn.Linear(32, 8), nn.Softmax(dim=-1)).eval()
    g = torch_import.convert_torch_module(m, (2, 16))
    x = np.random.default_rng(0).standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
      ref = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(_run(g, x), ref, rtol=1e-4, atol=1e-5)

  def test_cnn_matches_torch(self):
    torch.manual_seed(1)
    m = nn.Sequential(
        nn.Conv2d(3, 8, 3, stride=2, padding=1), nn.ReLU(),
        nn.Conv2d(8, 8, 3, stride=1, padding=0, groups=8), nn.ReLU6(),
        nn.Flatten(), nn.Linear(8 * 6 * 6, 10)).eval()
    g = torch_import.convert_torch_module(m, (1, 16, 16, 3))
    x = np.random.default_rng(1).standard_normal((1, 16, 16, 3)).astype(
        np.float32)
    with torch.no_grad():
      ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = _run(g, x)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

  def test_silu_and_pool(self):
    torch.manual_seed(2)
    m = nn.Sequential(
        nn.Conv2d(1, 4, 3, padding=1), nn.SiLU(), nn.AvgPool2d(2),
        nn.Flatten(), nn.Linear(4 * 4 * 4, 5)).eval()
    g = torch_import.convert_torch_module(m, (2, 8, 8, 1))
    x = np.random.default_rng(2).standard_normal((2, 8, 8, 1)).astype(
        np.float32)
    with torch.no_grad():
      ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(_run(g, x), ref, rtol=1e-3, atol=1e-4)

  def test_quantize_converted_model(self):
    torch.manual_seed(3)
    m = nn.Sequential(nn.Linear(64, 128), nn.GELU(),
                      nn.Linear(128, 16)).eval()
    g = torch_import.convert_torch_module(m, (4, 64))
    qt = Quantizer(g, 'dynamic_wi8_afp32')
    res = qt.quantize()
    assert any(t.dtype == 'int8'
               for t in res.quantized_model.main_subgraph().tensors)
    r = qt.validate(num_samples=2).get_signature_comparison_result(
        g.signatures[0].signature_key)
    assert all(v < 1e-2 for v in r.output_tensors.values())

  def test_unsupported_module_raises(self):
    with pytest.raises(NotImplementedError):
      torch_import.convert_torch_module(
          nn.Sequential(nn.LSTM(4, 4)), (1, 4))
