"""In-place KV-cache row updates as tiny Pallas DMA kernels.

XLA's lowering of the per-layer int8 cache `dynamic_update_slice` costs
~42 us per update on v5e at the serving shape ([256, 1, 1024, 256] cache,
[256, 1, 1, 256] update): 36 updates/step added 1.5 ms to a 7.4 ms decode
step (measured by the AEQT_SKIP_CACHE_WRITE A/B, docs/ROUND2_NOTES.md).

This kernel keeps the cache in HBM (memory space ANY), aliases it
input->output, and read-modify-writes ONLY the row-tile containing the
updated row: Mosaic requires HBM slices to be tile-aligned on the
second-to-last dim (a direct 1-row DMA fails lowering), so it DMAs the
aligned row-tile into VMEM, splices the new row with an iota select, and
DMAs the tile back. Per update that is 2 x B*NK*tile_rows*H bytes
(~1-4 MB) instead of whatever XLA's DUS emission touches.

Reference-parity anchor: this accelerates the reference's in-place
KV-cache update pattern (DYNAMIC_UPDATE_SLICE with SAME_AS_OUTPUT scale,
/root/reference/ai_edge_quantizer/algorithms/uniform_quantize/common_quantize.py:479-497);
the numerics are bit-identical integer splices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(dtype) -> int:
  """Sublane tile extent for HBM slices of this dtype (packed sublanes)."""
  itemsize = jnp.dtype(dtype).itemsize
  return {1: 32, 2: 16}.get(itemsize, 8)


def _dus_kernel(ndim, tile_rows, starts_ref, upd_ref, cache_ref, out_ref,
                scratch, sem):
  del cache_ref  # aliased with out_ref; all access goes through out_ref
  p = starts_ref[ndim - 2]
  s0 = (p // tile_rows) * tile_rows
  pre = tuple(slice(None) for _ in range(ndim - 2))
  tile_idx = pre + (pl.ds(s0, tile_rows), slice(None))
  cp_in = pltpu.make_async_copy(out_ref.at[tile_idx], scratch, sem)
  cp_in.start()
  cp_in.wait()
  rows = jax.lax.broadcasted_iota(jnp.int32, scratch.shape, ndim - 2)
  scratch[...] = jnp.where(
      rows == (p - s0), jnp.broadcast_to(upd_ref[...], scratch.shape),
      scratch[...])
  cp_out = pltpu.make_async_copy(scratch, out_ref.at[tile_idx], sem)
  cp_out.start()
  cp_out.wait()


def supports(operand_shape, update_shape, dtype) -> bool:
  """Static-shape gate for the fused row write (else: XLA DUS)."""
  ndim = len(operand_shape)
  if ndim < 2 or len(update_shape) != ndim:
    return False
  if update_shape[-2] != 1:
    return False
  if any(update_shape[i] != operand_shape[i]
         for i in range(ndim) if i != ndim - 2):
    return False
  tile_rows = _row_tile(dtype)
  if operand_shape[-2] % tile_rows or operand_shape[-2] < tile_rows:
    return False
  if operand_shape[-1] % 128:
    return False  # lane-dim tiling
  tile_bytes = jnp.dtype(dtype).itemsize * tile_rows
  for i in range(ndim):
    if i != ndim - 2:
      tile_bytes *= operand_shape[i]
  return tile_bytes <= 8 * 2**20  # VMEM scratch budget


@functools.partial(jax.jit, static_argnames=('interpret',))
def dus_row_inplace_pallas(
    operand: jax.Array,
    update: jax.Array,
    starts: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
  """`lax.dynamic_update_slice(operand, update, starts)` for one row.

  Requires `supports(operand.shape, update.shape, operand.dtype)`:
  update spans every dim fully except dim -2 where it is one row. The
  operand buffer is aliased to the output — the caller must be able to
  donate it (no other consumer of this value). starts: [ndim] int; only
  starts[-2] matters (all other dims have full extent, so lax's DUS
  clamps their starts to 0 — this kernel does the same).
  """
  ndim = operand.ndim
  if not supports(operand.shape, update.shape, operand.dtype):
    raise ValueError(
        f'unsupported row-DUS shapes: {operand.shape} <- {update.shape} '
        f'({operand.dtype})')
  tile_rows = _row_tile(operand.dtype)
  limits = jnp.asarray(
      [operand.shape[i] - update.shape[i] for i in range(ndim)], jnp.int32)
  starts = jnp.clip(starts.astype(jnp.int32).reshape(ndim), 0, limits)
  return pl.pallas_call(
      functools.partial(_dus_kernel, ndim, tile_rows),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pltpu.ANY),
      ],
      out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
      out_shape=jax.ShapeDtypeStruct(operand.shape, operand.dtype),
      input_output_aliases={2: 0},
      scratch_shapes=[
          pltpu.VMEM(
              operand.shape[:ndim - 2] + (tile_rows, operand.shape[-1]),
              operand.dtype),
          pltpu.SemaphoreType.DMA,
      ],
      interpret=interpret,
  )(starts, update.astype(operand.dtype), operand)
