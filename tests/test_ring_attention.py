"""Sequence-parallel int8-KV attention on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_edge_quantizer_tpu.parallel import mesh as mesh_lib
from ai_edge_quantizer_tpu.parallel import ring_attention as ra


def _sp_mesh(n=4):
  devs = jax.devices()[:n]
  from jax.sharding import Mesh
  return Mesh(np.array(devs), ('sp',))


def _int8_kv(rng, b, n, s, h):
  k_q = rng.integers(-127, 128, size=(b, n, s, h)).astype(np.int8)
  v_q = rng.integers(-127, 128, size=(b, n, s, h)).astype(np.int8)
  return jnp.asarray(k_q), jnp.asarray(v_q)


class TestDecodeSeqSharded:

  @pytest.mark.parametrize('zp', [(0.0, 0.0), (3.0, -5.0)])
  def test_matches_reference(self, zp):
    zp_k, zp_v = zp
    rng = np.random.default_rng(0)
    b, n, g, s, h = 2, 2, 2, 32, 16
    mesh = _sp_mesh(4)
    q = jnp.asarray(rng.standard_normal((b, n, g, h)), jnp.float32)
    k_q, v_q = _int8_kv(rng, b, n, s, h)
    # Additive mask: mask out the tail (as a cache with 20 valid slots).
    mask = np.zeros((b, s), np.float32)
    mask[:, 20:] = -1e30
    mask = jnp.asarray(mask)
    ks, vs = 0.02, 0.015
    out = ra.decode_attention_int8_seqsharded(
        q, k_q, v_q, ks, vs, mask, mesh, k_zero_point=zp_k,
        v_zero_point=zp_v)
    ref = ra.reference_attention_int8(
        q.reshape(b, n, g, h), k_q, v_q, ks, vs,
        jnp.broadcast_to(mask[:, None, :], (b, g, s)),
        k_zero_point=zp_k, v_zero_point=zp_v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


class TestRingPrefill:

  @pytest.mark.parametrize('zp', [(0.0, 0.0), (2.0, -1.0)])
  def test_causal_matches_reference(self, zp):
    zp_k, zp_v = zp
    rng = np.random.default_rng(1)
    b, n, t, h = 2, 2, 32, 16
    mesh = _sp_mesh(4)
    q = jnp.asarray(rng.standard_normal((b, n, t, h)), jnp.float32)
    k_q, v_q = _int8_kv(rng, b, n, t, h)
    ks, vs = 0.02, 0.015
    pos = jnp.arange(t, dtype=jnp.int32)
    out = ra.ring_attention_int8(
        q, k_q, v_q, ks, vs, pos, pos, mesh,
        k_zero_point=zp_k, v_zero_point=zp_v)
    causal = np.where(
        np.arange(t)[:, None] >= np.arange(t)[None, :], 0.0, -1e30)
    ref = ra.reference_attention_int8(
        q, k_q, v_q, ks, vs,
        jnp.broadcast_to(jnp.asarray(causal, jnp.float32)[None],
                         (b, t, t)),
        k_zero_point=zp_k, v_zero_point=zp_v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

  def test_long_sequence_8_shards(self):
    rng = np.random.default_rng(2)
    b, n, t, h = 1, 1, 256, 8
    mesh = _sp_mesh(8)
    q = jnp.asarray(rng.standard_normal((b, n, t, h)), jnp.float32)
    k_q, v_q = _int8_kv(rng, b, n, t, h)
    pos = jnp.arange(t, dtype=jnp.int32)
    out = ra.ring_attention_int8(q, k_q, v_q, 0.01, 0.01, pos, pos, mesh)
    causal = np.where(
        np.arange(t)[:, None] >= np.arange(t)[None, :], 0.0, -1e30)
    ref = ra.reference_attention_int8(
        q, k_q, v_q, 0.01, 0.01,
        jnp.broadcast_to(jnp.asarray(causal, jnp.float32)[None],
                         (b, t, t)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
