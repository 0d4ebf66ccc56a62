"""Pallas in-place row-DUS kernel vs lax.dynamic_update_slice (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_edge_quantizer_tpu.kernels import pallas_cache


@pytest.mark.parametrize(
    'cache_shape,starts',
    [
        ((4, 1, 64, 128), (0, 0, 7, 0)),     # KV-cache row, mid-tile
        ((4, 1, 64, 128), (0, 0, 0, 0)),     # first row
        ((4, 1, 64, 128), (0, 0, 63, 0)),    # last row
        ((4, 1, 64, 128), (0, 0, 1000, 0)),  # clamped to last row
        ((4, 1, 64, 128), (0, 0, 32, 0)),    # tile boundary
        ((8, 32, 128), (0, 9, 0)),           # rank 3
        ((64, 256), (13, 0)),                # rank 2
    ],
)
@pytest.mark.parametrize('dtype', [jnp.int8, jnp.float32])
def test_matches_lax_dus(cache_shape, starts, dtype):
  rng = np.random.default_rng(0)
  ndim = len(cache_shape)
  upd_shape = cache_shape[:-2] + (1,) + cache_shape[-1:]
  if dtype == jnp.int8:
    cache = jnp.asarray(rng.integers(-128, 128, size=cache_shape), dtype)
    upd = jnp.asarray(rng.integers(-128, 128, size=upd_shape), dtype)
  else:
    cache = jnp.asarray(rng.standard_normal(cache_shape), dtype)
    upd = jnp.asarray(rng.standard_normal(upd_shape), dtype)
  st = jnp.asarray(starts, jnp.int32)
  want = jax.lax.dynamic_update_slice(
      cache, upd, tuple(st[i] for i in range(ndim)))
  got = pallas_cache.dus_row_inplace_pallas(cache, upd, st, interpret=True)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_supports_gate():
  # the serving shape
  assert pallas_cache.supports((256, 1, 1024, 256), (256, 1, 1, 256),
                               jnp.int8)
  # multi-row update -> XLA
  assert not pallas_cache.supports((256, 1, 1024, 256), (256, 1, 2, 256),
                                   jnp.int8)
  # partial batch -> XLA
  assert not pallas_cache.supports((256, 1, 1024, 256), (128, 1, 1, 256),
                                   jnp.int8)
  # row dim not tile-aligned for int8 (needs %32)
  assert not pallas_cache.supports((4, 1, 24, 256), (4, 1, 1, 256),
                                   jnp.int8)
  # lane dim not 128-aligned
  assert not pallas_cache.supports((4, 1, 64, 64), (4, 1, 1, 64), jnp.int8)
  # f32 tile is 8 rows
  assert pallas_cache.supports((4, 1, 24, 128), (4, 1, 1, 128), jnp.float32)
  # scratch over budget
  assert not pallas_cache.supports((4096, 1, 1024, 2048), (4096, 1, 1, 2048),
                                   jnp.int8)


def test_unsupported_raises():
  cache = jnp.zeros((4, 1, 64, 64), jnp.int8)  # lane dim 64
  upd = jnp.zeros((4, 1, 1, 64), jnp.int8)
  with pytest.raises(ValueError):
    pallas_cache.dus_row_inplace_pallas(
        cache, upd, jnp.zeros((4,), jnp.int32), interpret=True)


def test_sole_consumer_guard():
  """The executor only aliases the cache when this DUS is its sole reader."""
  from ai_edge_quantizer_tpu.execution import executor as executor_lib
  from ai_edge_quantizer_tpu.graph import builder

  b = builder.GraphBuilder()
  cache = b.input('cache', (2, 1, 8, 4), 'float32')
  upd = b.input('upd', (2, 1, 1, 4), 'float32')
  pos = b.input('pos', (4,), 'int32')
  new = b.op('DYNAMIC_UPDATE_SLICE', [cache, upd, pos], [(2, 1, 8, 4)],
             output_names=['new'])
  # second consumer of `cache`
  b.op('ADD', [cache, cache], [(2, 1, 8, 4)], output_names=['dbl'])
  b.output(new)
  g = b.finalize()
  ex = executor_lib.GraphExecutor(g)
  sg = g.subgraphs[0]
  dus_op = next(o for o in sg.ops if o.opcode == 'DYNAMIC_UPDATE_SLICE')
  cache_tid = dus_op.inputs[0]
  assert not ex._sole_consumer(sg, cache_tid, dus_op)
  upd_tid = dus_op.inputs[1]
  assert ex._sole_consumer(sg, upd_tid, dus_op)
