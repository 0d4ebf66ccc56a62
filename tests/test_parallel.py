"""Multi-device tests on the 8-way virtual CPU mesh: sharded quantized
decode must match single-device results; shardings must follow the
quantized-dim rule."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from ai_edge_quantizer_tpu import Quantizer
from ai_edge_quantizer_tpu.execution.executor import GraphExecutor
from ai_edge_quantizer_tpu.models import gemma
from ai_edge_quantizer_tpu.parallel import mesh as mesh_lib
from ai_edge_quantizer_tpu.parallel import sharding as sharding_lib


@pytest.fixture(scope='module')
def quantized_toy_decode():
  cfg = gemma.TOY_DECODER
  g = gemma.build_decoder(cfg, batch=2, prefill_len=4,
                          signatures=('decode',))
  qt = Quantizer(g)
  qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 8)
  return cfg, qt.quantize().quantized_model


class TestMesh:

  def test_mesh_shapes(self):
    assert len(jax.devices()) == 8, 'conftest must force 8 CPU devices'
    m = mesh_lib.make_mesh(8)
    assert dict(m.shape) == {'dp': 1, 'tp': 8}
    m2 = mesh_lib.make_mesh(8, dp=2)
    assert dict(m2.shape) == {'dp': 2, 'tp': 4}
    with pytest.raises(ValueError):
      mesh_lib.make_mesh(8, dp=3, tp=3)


class TestShardedDecode:

  def test_weight_sharding_rules(self, quantized_toy_decode):
    cfg, graph = quantized_toy_decode
    mesh = mesh_lib.make_mesh(4, dp=1)
    ex = GraphExecutor(graph)
    shardings = sharding_lib.weight_shardings(graph, ex._weights, mesh)
    sg = graph.subgraphs[0]
    for (sg_idx, tid), sh in shardings.items():
      t = sg.tensors[tid]
      if 'ffw/gate/w' in t.name:
        # Column parallel: quantized (out) dim sharded.
        assert sh.spec == P('tp', None), t.name
      if 'ffw/down/w' in t.name:
        # Row parallel hint: contraction dim sharded.
        assert sh.spec == P(None, 'tp'), t.name

  def test_sharded_matches_single_device(self, quantized_toy_decode):
    cfg, graph = quantized_toy_decode
    inputs = gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=2)
    ex = GraphExecutor(graph)
    single = ex.signature_runner('decode')(inputs)

    mesh = mesh_lib.make_mesh(8, dp=2)
    fn, sharded_weights = sharding_lib.sharded_signature_runner(
        ex, 'decode', mesh)
    sharded = fn(sharded_weights, inputs)
    np.testing.assert_allclose(
        np.asarray(single['logits']), np.asarray(sharded['logits']),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(single['layer_0_k_cache']),
        np.asarray(sharded['layer_0_k_cache']), rtol=1e-4, atol=1e-4)

  def test_scales_shard_congruently(self, quantized_toy_decode):
    """Sharded einsum on the quantized dim must keep per-channel scales
    consistent — verified end to end by numerical equality above; here we
    additionally check the packed executor path survives a tp mesh."""
    cfg, graph = quantized_toy_decode
    mesh = mesh_lib.make_mesh(2, dp=1)
    ex = GraphExecutor(graph)
    fn, sw = sharding_lib.sharded_signature_runner(ex, 'decode', mesh)
    out = fn(sw, gemma.make_inputs(cfg, 'decode', 2, 1, start_pos=1))
    assert np.isfinite(np.asarray(out['logits'])).all()


class TestRingWeightGatherMatmul:

  def test_matches_dense(self):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ai_edge_quantizer_tpu.parallel import collectives
    mesh = mesh_lib.make_mesh(4, dp=1)
    rng = np.random.default_rng(0)
    n, k, b = 512, 128, 8
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    w_q = jnp.asarray(rng.integers(-127, 128, (n, k)), jnp.int8)
    scale = jnp.asarray(rng.random(n) * 0.01 + 1e-3, jnp.float32)
    w_sharded = jax.device_put(w_q, NamedSharding(mesh, P('tp', None)))
    s_sharded = jax.device_put(scale, NamedSharding(mesh, P('tp')))
    fn = collectives.make_ring_matmul(mesh)
    y = fn(x, w_sharded, s_sharded)
    dense = np.asarray(x) @ (
        np.asarray(w_q, np.float32) * np.asarray(scale)[:, None]).T
    np.testing.assert_allclose(np.asarray(y), dense, rtol=1e-4, atol=1e-4)


class TestMeshDecodeServer:
  """Continuous batching with the dp-sharded slot pool (VERDICT round-2
  item 5: the serving path exercised under the mesh)."""

  def _build(self, slots):
    cfg = gemma.TOY_DECODER
    g = gemma.build_serving_decoder(cfg, batch_slots=slots, prefill_len=8)
    gemma.stamp_int8_kv_cache(g)
    qt = Quantizer(g)
    qt.add_dynamic_config('.*', 'FULLY_CONNECTED', 4)
    return cfg, qt.quantize().quantized_model

  def test_mesh_server_matches_unsharded_tokens(self):
    from ai_edge_quantizer_tpu.parallel.batching import DecodeServer
    cfg, graph = self._build(slots=4)
    mesh = mesh_lib.make_mesh(8, dp=2)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, size=n) for n in (3, 5, 4)]

    def run(mesh_arg):
      srv = DecodeServer(graph, cfg, batch_slots=4, mesh=mesh_arg)
      ids = [srv.submit(p, max_new_tokens=4) for p in prompts]
      toks = {i: [] for i in ids}
      for _ in range(20):
        for rid, t in srv.step().items():
          toks[rid].append(t)
        if not srv.has_work():
          break
      return [toks[i] for i in ids], srv

    sharded_toks, srv = run(mesh)
    plain_toks, _ = run(None)
    assert sharded_toks == plain_toks, (sharded_toks, plain_toks)
    # The slot pool is genuinely dp-sharded.
    cache = next(iter(srv._caches.values()))
    assert not cache.sharding.is_fully_replicated
    shard_shape = cache.sharding.shard_shape(cache.shape)
    assert shard_shape[0] == cache.shape[0] // 2  # split over dp=2

  def test_mesh_server_rejects_indivisible_slots(self):
    from ai_edge_quantizer_tpu.parallel.batching import DecodeServer
    cfg, graph = self._build(slots=3)
    mesh = mesh_lib.make_mesh(8, dp=2)
    with pytest.raises(ValueError, match='must divide'):
      DecodeServer(graph, cfg, batch_slots=3, mesh=mesh)


def test_ring_matmul_packed_int4():
  """Packed-int4 ring gather: half the ICI bytes per hop, exact numerics
  vs the dense dequant matmul."""
  import jax.numpy as jnp
  from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
  from ai_edge_quantizer_tpu.parallel import collectives

  rng = np.random.default_rng(0)
  mesh8 = mesh_lib.make_mesh(8, dp=1)
  tp = mesh8.shape['tp']
  n, k, b = 32 * tp, 64, 4
  w = rng.integers(-8, 8, (n, k)).astype(np.int8)
  s = (rng.random(n) * 0.02 + 0.01).astype(np.float32)
  x = rng.standard_normal((b, k)).astype(np.float32)
  packed = pallas_qmatmul.pack_int4_split(jnp.asarray(w))
  from jax.sharding import NamedSharding, PartitionSpec as P
  wp = jax.device_put(packed, NamedSharding(mesh8, P('tp', None)))
  sp = jax.device_put(jnp.asarray(s), NamedSharding(mesh8, P('tp')))
  fn = collectives.make_ring_matmul(mesh8, packed_int4=True)
  got = np.asarray(fn(jnp.asarray(x), wp, sp))
  want = x @ (w.astype(np.float32) * s[:, None]).T
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
