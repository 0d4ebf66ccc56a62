"""Explicit collective patterns for quantized weights (shard_map level).

`ring_weight_gather_matmul`: FSDP-style serving — integer weight shards
live distributed (memory capacity), and each decode step streams them
around the 'tp' ring while every device computes the matmul chunk for the
shard it currently holds. The weights move as INTEGERS (4-8x less ICI
traffic than f32), and each ppermute hop overlaps with the local
dequant-matmul (XLA's latency-hiding scheduler pipelines the collective
with the dot). After tp hops every device has the full output.

This is the 'int-weight all-gather overlapped with compute' pattern from
the north star; column/row-parallel stationary shardings
(parallel/sharding.py) remain the default when weights fit per-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_weight_gather_matmul_local(
    x: jax.Array,
    w_shard: jax.Array,
    scale_shard: jax.Array,
    axis_name: str = 'tp',
    packed_int4: bool = False,
) -> jax.Array:
  """Per-device body (call under shard_map over `axis_name`).

  x: [B, K] replicated activations.
  w_shard: [N/tp, K] integer weight shard held by this device — or, with
  packed_int4=True, a [N/tp, K//2] uint8 split-half packed int4 shard
  (kernels/pallas_qmatmul.pack_int4_split layout): the ring then moves
  HALF the bytes per hop, and each device unpacks in registers.
  scale_shard: [N/tp] matching per-channel scales.
  Returns y: [B, N] fully materialized on every device.
  """
  tp = jax.lax.psum(1, axis_name)
  my = jax.lax.axis_index(axis_name)
  n_shard = w_shard.shape[0]
  b = x.shape[0]

  def body(step, carry):
    w_cur, s_cur, y = carry
    # Whose shard are we holding after `step` hops? Shards travel +1 each
    # hop, so we hold shard (my - step) mod tp.
    owner = (my - step) % tp
    if packed_int4:
      w32 = w_cur.astype(jnp.int32)
      lo = (((w32 & 0xF) ^ 8) - 8).astype(x.dtype)   # x[:, :K/2] half
      hi = (((w32 >> 4) ^ 8) - 8).astype(x.dtype)    # x[:, K/2:] half
      k2 = w32.shape[1]
      chunk = jax.lax.dot_general(
          x[:, :k2], lo,
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      chunk = chunk + jax.lax.dot_general(
          x[:, k2:], hi,
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      chunk = chunk * s_cur.astype(jnp.float32)[None, :]
    else:
      chunk = jax.lax.dot_general(
          x, w_cur.astype(x.dtype),
          dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32,
      ) * s_cur.astype(jnp.float32)[None, :]
    y = jax.lax.dynamic_update_slice(
        y, chunk.astype(y.dtype), (0, owner * n_shard))
    # Pass the integer shard to the right neighbor; the permute overlaps
    # with the next step's matmul.
    perm = [(i, (i + 1) % tp) for i in range(tp)]
    w_nxt = jax.lax.ppermute(w_cur, axis_name, perm)
    s_nxt = jax.lax.ppermute(s_cur, axis_name, perm)
    return w_nxt, s_nxt, y

  y0 = jnp.zeros((b, n_shard * tp), jnp.float32)
  # The accumulator is device-varying inside the ring loop; mark the
  # initial carry accordingly (shard_map varying-axes typing). Replication
  # of the final result cannot be statically inferred, so the caller's
  # shard_map disables the check (every device provably computes every
  # chunk).
  y0 = jax.lax.pcast(y0, (axis_name,), to='varying')
  _, _, y = jax.lax.fori_loop(0, tp, body, (w_shard, scale_shard, y0))
  return y


def make_ring_matmul(mesh: Mesh, axis_name: str = 'tp',
                     packed_int4: bool = False):
  """jitted f(x, w_sharded, scale_sharded) -> y with the ring schedule.

  w must be placed with P('tp', None) (shards along out-channels: the
  quantized dim, so scales shard congruently and packed sub-byte rows never
  straddle devices). packed_int4=True streams split-half packed uint8
  shards around the ring (half the ICI bytes of int8, an eighth of f32).
  """
  body = functools.partial(ring_weight_gather_matmul_local,
                           axis_name=axis_name, packed_int4=packed_int4)
  in_specs = (P(), P(axis_name, None), P(axis_name))
  if hasattr(jax, 'shard_map'):  # jax >= 0.8 keyword-only API
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=P(),
                       check_vma=False)
  else:  # pragma: no cover - legacy API
    from jax.experimental.shard_map import shard_map
    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=P(),
                   check_rep=False)
  return jax.jit(fn)
