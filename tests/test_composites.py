"""STABLEHLO_COMPOSITE ops: execution via body subgraphs + quantization
skip semantics for non-whitelisted composites."""

import numpy as np

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.graph import ir
from ai_edge_quantizer_tpu.graph.builder import GraphBuilder


def _composite_model(composite_name='odml.rms_norm'):
  rng = np.random.default_rng(0)
  graph = ir.Graph()
  # Body subgraph: rms_norm(x, gamma).
  body = GraphBuilder('body', graph=graph)
  bx = body.input('body/x', (2, 16))
  gamma = body.constant('body/gamma', np.full(16, 0.5, np.float32))
  by = body.op('RMS_NORM', [bx, gamma], [(2, 16)],
               output_names=['body/out'], attrs={'epsilon': 1e-6})
  body.subgraph.outputs.append(by)
  body_idx = body.subgraph_index

  main = GraphBuilder('main', graph=graph)
  x = main.input('x', (2, 16))
  w = main.constant('fc/w', (rng.normal(size=(16, 16)) * 0.2).astype(
      np.float32))
  h = main.op('FULLY_CONNECTED', [x, w, -1], [(2, 16)],
              output_names=['fc/out'], attrs={'fused_activation': 'NONE'})
  comp = ir.Op(opcode='STABLEHLO_COMPOSITE', inputs=[h], outputs=[],
               attrs={'composite_name': composite_name},
               side_effect_subgraphs=[body_idx])
  out_tid = main.subgraph.add_tensor(ir.Tensor(
      name='composite/out', shape=(2, 16), dtype='float32'))
  comp.outputs = [out_tid]
  main.subgraph.ops.append(comp)
  main.output(out_tid, user_name='y')
  graph.signatures.append(ir.SignatureDef(
      signature_key='serving_default', subgraph_index=main.subgraph_index,
      inputs={'x': x}, outputs={'y': out_tid}))
  return graph


def test_composite_executes_body():
  g = _composite_model()
  rng = np.random.default_rng(1)
  x = rng.standard_normal((2, 16)).astype(np.float32)
  out = GraphExecutor(g).signature_runner()({'x': x})
  y = np.asarray(out['y'])
  # Expected: rms_norm(fc(x)) * gamma.
  sg = g.subgraphs[g.signatures[0].subgraph_index]
  w = g.tensor_data(sg.tensor_by_name('fc/w'))
  h = x @ np.asarray(w).T
  expected = h / np.sqrt((h ** 2).mean(-1, keepdims=True) + 1e-6) * 0.5
  np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_non_quantizable_composite_keeps_model_float_inside():
  g = _composite_model(composite_name='vendor.custom_thing')
  qt = Quantizer(g, 'dynamic_wi8_afp32')
  res = qt.quantize()
  # Main-graph FC weight quantizes; the opaque composite's body stays float.
  sgm = res.quantized_model.subgraphs[g.signatures[0].subgraph_index]
  assert sgm.tensor_by_name('fc/w').dtype == 'int8'
  body = res.quantized_model.subgraphs[0]
  assert all(t.dtype == 'float32' for t in body.tensors)
