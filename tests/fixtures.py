"""Fixture model zoo for tests (the analog of the reference's tests/models
directory of tiny .tflite files, built programmatically)."""

from __future__ import annotations

import numpy as np

from ai_edge_quantizer_tpu.graph.builder import GraphBuilder


def two_layer_mlp(seed: int = 0, in_dim: int = 64, hidden: int = 32,
                  out_dim: int = 16, batch: int = 2):
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (batch, in_dim))
  h = b.fully_connected(
      x, (rng.normal(size=(hidden, in_dim)) * 0.2).astype(np.float32),
      (rng.normal(size=hidden) * 0.1).astype(np.float32),
      name='dense1', activation='RELU')
  y = b.fully_connected(
      h, (rng.normal(size=(out_dim, hidden)) * 0.2).astype(np.float32),
      None, name='dense2')
  b.output(y)
  return b.finalize()


def single_fc(seed: int = 0, in_dim: int = 64, out_dim: int = 128,
              batch: int = 2, bias: bool = True):
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (batch, in_dim))
  y = b.fully_connected(
      x, (rng.normal(size=(out_dim, in_dim)) * 0.2).astype(np.float32),
      (rng.normal(size=out_dim) * 0.1).astype(np.float32) if bias else None,
      name='fc')
  b.output(y)
  return b.finalize()


def conv_fc_mnist(seed: int = 0):
  """Tiny conv+fc 'MNIST-class' model (NHWC 28x28x1)."""
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (1, 28, 28, 1))
  c1 = b.conv2d(x, (rng.normal(size=(8, 3, 3, 1)) * 0.3).astype(np.float32),
                (rng.normal(size=8) * 0.1).astype(np.float32),
                stride=1, padding='SAME', name='conv1', activation='RELU')
  p1 = b.op('MAX_POOL_2D', [c1], [(1, 14, 14, 8)],
            output_names=['pool1/out'],
            attrs={'filter_size': 2, 'stride': 2, 'padding': 'VALID'})
  r1 = b.op('RESHAPE', [p1], [(1, 14 * 14 * 8)], output_names=['flat/out'],
            attrs={'new_shape': [1, 14 * 14 * 8]})
  f1 = b.fully_connected(
      r1, (rng.normal(size=(32, 14 * 14 * 8)) * 0.05).astype(np.float32),
      (rng.normal(size=32) * 0.1).astype(np.float32),
      name='fc1', activation='RELU')
  f2 = b.fully_connected(
      f1, (rng.normal(size=(10, 32)) * 0.2).astype(np.float32),
      (rng.normal(size=10) * 0.1).astype(np.float32), name='fc2')
  sm = b.unary('SOFTMAX', f2, name='probs')
  b.output(sm)
  return b.finalize()


def shared_weight_two_fc(seed: int = 0):
  """Two FC ops consuming the SAME weight tensor (shared-tensor case)."""
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (2, 32))
  w = b.constant('shared/w', (rng.normal(size=(32, 32)) * 0.2).astype(
      np.float32))
  h1 = b.op('FULLY_CONNECTED', [x, w, -1], [(2, 32)],
            output_names=['fc1/out'], attrs={'fused_activation': 'NONE'})
  h2 = b.op('FULLY_CONNECTED', [h1, w, -1], [(2, 32)],
            output_names=['fc2/out'], attrs={'fused_activation': 'NONE'})
  b.output(h2)
  return b.finalize()


def shared_buffer_two_tensors(seed: int = 0):
  """Two distinct tensors aliasing one buffer (shared-buffer case)."""
  rng = np.random.default_rng(seed)
  b = GraphBuilder('main')
  x = b.input('x', (2, 32))
  data = (rng.normal(size=(32, 32)) * 0.2).astype(np.float32)
  w1 = b.constant('w_a', data)
  buf = b.subgraph.tensors[w1].buffer
  w2 = b.shared_constant('w_b', buf, data.shape, 'float32')
  h1 = b.op('FULLY_CONNECTED', [x, w1, -1], [(2, 32)],
            output_names=['fc1/out'], attrs={'fused_activation': 'NONE'})
  h2 = b.op('FULLY_CONNECTED', [h1, w2, -1], [(2, 32)],
            output_names=['fc2/out'], attrs={'fused_activation': 'NONE'})
  b.output(h2)
  return b.finalize()
