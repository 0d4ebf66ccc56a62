"""utils/flops graph FLOPs accounting (feeds the bench MFU ceilings)."""

import numpy as np

from ai_edge_quantizer_tpu.graph.builder import GraphBuilder
from ai_edge_quantizer_tpu.utils import flops as flops_lib

RNG = np.random.default_rng(0)


def test_fc_conv_dwconv_counts():
  b = GraphBuilder('main')
  x = b.input('x', (2, 8, 8, 4))
  h = b.conv2d(x, RNG.normal(size=(8, 3, 3, 4)).astype(np.float32),
               None, stride=1, padding='SAME', name='conv')
  h = b.depthwise_conv2d(
      h, RNG.normal(size=(1, 3, 3, 8)).astype(np.float32), None,
      stride=1, padding='SAME', name='dw')
  g = b.finalize()
  sg = g.main_subgraph()
  # conv: 2 * out_elems(2*8*8*8) * 3*3*4 = 73728 MACs*2
  # dw:   2 * out_elems(2*8*8*8) * 3*3
  assert flops_lib.subgraph_flops(sg) == (
      2 * (2 * 8 * 8 * 8) * 36 + 2 * (2 * 8 * 8 * 8) * 9)


def test_fc_and_batch_matmul():
  b = GraphBuilder('main')
  x = b.input('x', (4, 32))
  y = b.fully_connected(
      x, RNG.normal(size=(16, 32)).astype(np.float32), None, name='fc')
  b.output(y)
  g = b.finalize()
  assert flops_lib.graph_flops(g) == 2 * 4 * 16 * 32

  b2 = GraphBuilder('main')
  p = b2.input('p', (2, 4, 8))
  q = b2.input('q', (2, 8, 16))
  z = b2.op('BATCH_MATMUL', [p, q], [(2, 4, 16)], output_names=['z'])
  b2.output(z)
  g2 = b2.finalize()
  assert flops_lib.graph_flops(g2) == 2 * (2 * 4 * 16) * 8


def test_mobilenet_matches_published():
  from ai_edge_quantizer_tpu.models import mobilenet
  g = mobilenet.build_mobilenet_v2(batch=1, image_size=224)
  gf = flops_lib.graph_flops(g) / 1e9
  # MobileNetV2 published ~300M MACs = ~0.6 GFLOPs.
  assert 0.55 < gf < 0.65, gf
