"""Structural multi-chip scaling evidence (VERDICT r3 item 4a).

Real multi-chip hardware is unavailable here, so these tests establish the
two properties the ≥85% scaling claim rests on, from the compiled HLO of
the tp-sharded ring weight gather (`parallel/collectives.py`):

1. **Overlap legality**: inside the ring loop body, the collective-permute
   that forwards the weight shard is dataflow-INDEPENDENT of the step's
   matmul (the dot consumes the pre-permute shard; the permute forwards
   the same pre-permute value). XLA's TPU latency-hiding scheduler turns
   exactly this pattern into collective-permute-start/done pairs bracketing
   the dot — the CPU backend keeps it synchronous, so what we assert is
   the data dependence that MAKES the overlap schedulable, not the
   schedule itself.
2. **Wire compression**: the permuted payload is the packed-int4 uint8
   buffer at K/2 columns — 1/8 the bytes of an f32 ring and 1/2 int8 —
   so the modeled wire time in SCALING_r04.json uses the right byte count.

Run on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ai_edge_quantizer_tpu.parallel import collectives


def _compiled_ring_hlo(packed_int4=True, b=8, k=256, n=512):
  devices = np.array(jax.devices()[:8]).reshape(8,)
  mesh = Mesh(devices, ('tp',))
  fn = collectives.make_ring_matmul(mesh, packed_int4=packed_int4)
  x = jnp.zeros((b, k), jnp.bfloat16)
  cols = k // 2 if packed_int4 else k
  w = jax.device_put(
      jnp.zeros((n, cols), jnp.uint8 if packed_int4 else jnp.int8),
      NamedSharding(mesh, P('tp', None)))
  s = jax.device_put(jnp.ones((n,), jnp.float32),
                     NamedSharding(mesh, P('tp')))
  return fn.lower(x, w, s).compile().as_text(), (b, k, n)


def _def_lines(hlo: str) -> dict:
  """Map %name -> its defining line, across all computations."""
  defs = {}
  for ln in hlo.splitlines():
    m = re.match(r'\s*(%[\w.\-]+)\s*=', ln)
    if m:
      defs[m.group(1)] = ln
  return defs


def _operands(line: str) -> list:
  """Operand names of an HLO instruction line (first paren group)."""
  m = re.search(r'=\s*[\w\[\]{},:\d\s]*\s\w[\w\-]*\((.*)', line)
  body = m.group(1) if m else line
  return re.findall(r'%[\w.\-]+', body)


def _ancestry_has_dot(name: str, defs: dict, seen=None) -> bool:
  """Does `name`'s transitive def chain include a dot (matmul)?"""
  seen = seen if seen is not None else set()
  if name in seen or name not in defs:
    return False
  seen.add(name)
  line = defs[name]
  opcode = re.search(r'=\s*(?:[\w\[\]{},\d]+\s+)?([\w\-]+)\(', line)
  if opcode and opcode.group(1) in ('dot', 'dot_general'):
    return True
  return any(_ancestry_has_dot(op, defs, seen) for op in _operands(line))


class TestRingGatherHlo:

  @pytest.fixture(scope='class')
  def hlo(self):
    txt, dims = _compiled_ring_hlo(packed_int4=True)
    return txt, dims

  def test_permute_and_dot_coexist_in_loop_body(self, hlo):
    txt, _ = hlo
    permutes = [ln for ln in txt.splitlines() if 'collective-permute(' in ln]
    dots = [ln for ln in txt.splitlines()
            if re.search(r'=\s*[\w\[\]{},\d]+\s+dot\(', ln)]
    assert len(permutes) >= 2, permutes  # weight shard + scale shard
    assert len(dots) >= 2, dots          # packed halves: lo and hi dots

  def test_permute_payload_is_packed_uint8_half_k(self, hlo):
    txt, (b, k, n) = hlo
    shard_rows = n // 8
    pat = rf'u8\[{shard_rows},{k // 2}\]\S*\s+collective-permute\('
    assert re.search(pat, txt), (
        f'expected a u8[{shard_rows},{k//2}] collective-permute '
        '(packed-int4 wire payload)')

  def test_weight_permute_independent_of_dot(self, hlo):
    """The forwarded shard must not be derived from this step's matmul:
    that independence is what lets the TPU scheduler run the permute and
    the dot concurrently (ppermute-overlaps-compute, collectives.py:74)."""
    txt, _ = hlo
    defs = _def_lines(txt)
    weight_permutes = [
        ln for ln in txt.splitlines()
        if 'collective-permute(' in ln and re.search(r'=\s*u8\[', ln)
    ]
    assert weight_permutes
    for ln in weight_permutes:
      for op in _operands(ln):
        assert not _ancestry_has_dot(op, defs), (
            f'collective-permute operand {op} depends on a dot; the ring '
            f'would serialize: {ln.strip()[:120]}')

  def test_ring_matches_dense_matmul(self):
    """Numeric proof the overlapped schedule computes the right thing."""
    rng = np.random.default_rng(0)
    b, k, n = 4, 64, 128
    devices = np.array(jax.devices()[:8]).reshape(8,)
    mesh = Mesh(devices, ('tp',))
    fn = collectives.make_ring_matmul(mesh, packed_int4=False)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    w_int = rng.integers(-7, 8, (n, k)).astype(np.int8)
    scale = (rng.random(n) * 0.1 + 0.01).astype(np.float32)
    w = jax.device_put(jnp.asarray(w_int), NamedSharding(mesh, P('tp', None)))
    s = jax.device_put(jnp.asarray(scale), NamedSharding(mesh, P('tp')))
    y = np.asarray(fn(x, w, s))
    ref = np.asarray(x) @ (w_int.astype(np.float32) * scale[:, None]).T
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


class TestTpShardedDecodeHlo:
  """The ACTUAL decode step under tp/dp sharding: compiled HLO contains
  the tp-group collectives XLA derived from the sharding annotations
  (parallel/sharding.py column/row-parallel rules), and the program
  executes (VERDICT r3 item 4a, decode-step variant)."""

  def test_decode_step_collectives_and_execution(self):
    from ai_edge_quantizer_tpu.execution import executor as executor_lib
    from ai_edge_quantizer_tpu.models import gemma
    from ai_edge_quantizer_tpu.parallel import (
        mesh as mesh_lib, sharding as sharding_lib)

    cfg = gemma.TOY_DECODER
    g = gemma.build_decoder(cfg, batch=8, prefill_len=8,
                            signatures=('decode',),
                            materialize_weights=False)
    w = gemma.device_materialize_quantized(g)
    ex = executor_lib.GraphExecutor(g)
    ex._weights = w
    mesh = mesh_lib.make_mesh(8, dp=2)  # dp=2 x tp=4
    fn, sw = sharding_lib.sharded_signature_runner(ex, 'decode', mesh)
    inputs = gemma.make_inputs(cfg, 'decode', 8, 1, start_pos=8)
    txt = fn.lower(sw, inputs).compile().as_text()
    collectives = [ln for ln in txt.splitlines()
                   if re.search(r'all-(reduce|gather)(-start)?\(', ln)]
    assert len(collectives) >= 4, 'tp sharding must induce collectives'
    # The groups span the tp axis (4-wide within each dp shard).
    assert any('replica_groups=[2,4]' in ln for ln in collectives), (
        collectives[:3])
    out = fn(sw, inputs)
    assert np.isfinite(
        np.asarray(out['logits'], np.float32)).all()
