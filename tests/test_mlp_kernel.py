"""MLP megakernel: one-call GeGLU block over packed int4 weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_edge_quantizer_tpu.kernels import pallas_mlp, pallas_qmatmul


def _make(m=8, d=256, f=512, seed=0):
  rng = np.random.default_rng(seed)
  x = rng.standard_normal((m, d)).astype(np.float32)
  wg = rng.integers(-8, 8, (f, d)).astype(np.int8)
  wu = rng.integers(-8, 8, (f, d)).astype(np.int8)
  wd = rng.integers(-8, 8, (d, f)).astype(np.int8)
  sg = (rng.random(f) * 0.01 + 0.001).astype(np.float32)
  su = (rng.random(f) * 0.01 + 0.001).astype(np.float32)
  sd = (rng.random(d) * 0.01 + 0.001).astype(np.float32)
  return x, wg, wu, wd, sg, su, sd


class TestGroupedPacking:

  def test_round_trip(self):
    rng = np.random.default_rng(0)
    w = rng.integers(-8, 8, (64, 512)).astype(np.int8)
    packed = pallas_mlp.pack_int4_split_grouped(jnp.asarray(w), group=128)
    back = np.asarray(pallas_mlp.unpack_int4_split_grouped(packed, 128))
    np.testing.assert_array_equal(back, w)

  def test_group_equals_k_matches_plain_split(self):
    rng = np.random.default_rng(1)
    w = rng.integers(-8, 8, (32, 256)).astype(np.int8)
    grouped = pallas_mlp.pack_int4_split_grouped(jnp.asarray(w), group=256)
    plain = pallas_qmatmul.pack_int4_split(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(plain))


class TestMlpMegakernel:

  @pytest.mark.parametrize('bf', [128, 256])
  def test_bf16_variant_matches_reference(self, bf):
    x, wg, wu, wd, sg, su, sd = _make()
    wgu = np.concatenate([wg, wu], axis=0)
    packed_gu = pallas_qmatmul.pack_int4_split(jnp.asarray(wgu))
    grouped_d = pallas_mlp.pack_int4_split_grouped(jnp.asarray(wd), bf)
    got = np.asarray(pallas_mlp.mlp_pallas_int4_packed(
        x, packed_gu, jnp.asarray(np.concatenate([sg, su])), grouped_d,
        jnp.asarray(sd), drq=False, bf=bf, interpret=True))
    want = np.asarray(pallas_mlp.mlp_reference(
        jnp.asarray(x), wg, wu, wd, jnp.asarray(sg), jnp.asarray(su),
        jnp.asarray(sd)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  def test_drq_variant_close_to_reference(self):
    x, wg, wu, wd, sg, su, sd = _make(seed=2)
    wgu = np.concatenate([wg, wu], axis=0)
    packed_gu = pallas_qmatmul.pack_int4_split(jnp.asarray(wgu))
    grouped_d = pallas_mlp.pack_int4_split_grouped(jnp.asarray(wd), 128)
    got = np.asarray(pallas_mlp.mlp_pallas_int4_packed(
        x, packed_gu, jnp.asarray(np.concatenate([sg, su])), grouped_d,
        jnp.asarray(sd), drq=True, bf=128, interpret=True))
    want = np.asarray(pallas_mlp.mlp_reference(
        jnp.asarray(x), wg, wu, wd, jnp.asarray(sg), jnp.asarray(su),
        jnp.asarray(sd)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 0.02, err

  def test_3d_bf16_input(self):
    x, wg, wu, wd, sg, su, sd = _make(seed=3)
    x3 = x.reshape(2, 4, -1)
    wgu = np.concatenate([wg, wu], axis=0)
    packed_gu = pallas_qmatmul.pack_int4_split(jnp.asarray(wgu))
    grouped_d = pallas_mlp.pack_int4_split_grouped(jnp.asarray(wd), 128)
    got = pallas_mlp.mlp_pallas_int4_packed(
        jnp.asarray(x3, jnp.bfloat16), packed_gu,
        jnp.asarray(np.concatenate([sg, su])), grouped_d,
        jnp.asarray(sd), drq=True, bf=128, interpret=True)
    assert got.shape == (2, 4, 256)
    assert got.dtype == jnp.bfloat16
    want = np.asarray(pallas_mlp.mlp_reference(
        jnp.asarray(x3), wg, wu, wd, jnp.asarray(sg), jnp.asarray(su),
        jnp.asarray(sd)))
    err = (np.linalg.norm(np.asarray(got, np.float32) - want)
           / np.linalg.norm(want))
    assert err < 0.05, err

  def test_silu_activation(self):
    x, wg, wu, wd, sg, su, sd = _make(seed=4)
    wgu = np.concatenate([wg, wu], axis=0)
    packed_gu = pallas_qmatmul.pack_int4_split(jnp.asarray(wgu))
    grouped_d = pallas_mlp.pack_int4_split_grouped(jnp.asarray(wd), 128)
    got = np.asarray(pallas_mlp.mlp_pallas_int4_packed(
        x, packed_gu, jnp.asarray(np.concatenate([sg, su])), grouped_d,
        jnp.asarray(sd), act='silu', drq=False, bf=128, interpret=True))
    want = np.asarray(pallas_mlp.mlp_reference(
        jnp.asarray(x), wg, wu, wd, jnp.asarray(sg), jnp.asarray(su),
        jnp.asarray(sd), act='silu'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

  def test_m_blocked_large_batch_matches_reference(self):
    """M > 256 takes the multi-row-tile grid (prefill shapes: an
    unblocked M=1024 pass exceeded the 16 MB Mosaic VMEM limit)."""
    rng = np.random.default_rng(11)
    m, d, f = 600, 256, 512  # m deliberately not a multiple of bm
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    wg = jnp.asarray(rng.integers(-7, 8, (f, d)), jnp.int8)
    wu = jnp.asarray(rng.integers(-7, 8, (f, d)), jnp.int8)
    wd = jnp.asarray(rng.integers(-7, 8, (d, f)), jnp.int8)
    sg = jnp.asarray(rng.random(f) * 0.01 + 0.001, jnp.float32)
    su = jnp.asarray(rng.random(f) * 0.01 + 0.001, jnp.float32)
    sd = jnp.asarray(rng.random(d) * 0.01 + 0.001, jnp.float32)
    packed_gu = pallas_qmatmul.pack_int4_split(jnp.concatenate([wg, wu]))
    grouped_d = pallas_mlp.pack_int4_split_grouped(wd, 256)
    got = np.asarray(pallas_mlp.mlp_pallas_int4_packed(
        x, packed_gu, jnp.concatenate([sg, su]), grouped_d, sd,
        drq=False, bf=256, interpret=True))
    want = np.asarray(pallas_mlp.mlp_reference(x, wg, wu, wd, sg, su, sd))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
