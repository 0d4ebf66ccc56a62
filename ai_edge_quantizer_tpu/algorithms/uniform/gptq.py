"""GPTQ: Hessian-weighted optimal brain surgeon weight quantization
(arXiv:2210.17323).

Calibration accumulates the input-activation Hessian 2/n * XᵀX per FC
input; materialization quantizes weight columns one at a time, propagating
the quantization error through the inverse-Hessian (lazy block updates,
block size 64). FULLY_CONNECTED only; Hessians merge across calibration
batches sample-weighted (utils/qsv_utils.gptq_and_moving_average_update).

Parity: reference `algorithms/uniform_quantize/gptq.py`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Mapping, Optional

import numpy as np
import scipy.linalg

from ai_edge_quantizer_tpu import qtyping
from ai_edge_quantizer_tpu.algorithms.uniform import engine
from ai_edge_quantizer_tpu.algorithms.uniform import min_max
from ai_edge_quantizer_tpu.algorithms.uniform import quant_numerics as qn

ALGORITHM_KEY = 'GPTQ'

_DAMP_FACTOR = 0.01
_OBS_BLOCK = 64
_CALIBRATION_VALID_RANGE = (-3e38, 3e38)


def calibrate(
    op,
    graph_info: qtyping.GraphInfo,
    tensor_content_map: Mapping[str, np.ndarray],
    inputs_to_ignore=None,
    outputs_to_ignore=None,
) -> dict:
  """Min/max + input Hessian 2/n * XᵀX for the op's activations."""
  op_qsvs: dict = {}
  lo, hi = _CALIBRATION_VALID_RANGE
  tensors = graph_info.subgraph.tensors

  def collect(tid: int) -> None:
    t = tensors[tid]
    if engine.tensor_data_of(graph_info, t) is not None:
      return
    content = np.asarray(tensor_content_map[t.name], np.float32)
    x = content.reshape(-1, content.shape[-1])
    num_samples = content.shape[0]
    qsv_shape = (1,) * content.ndim
    mask = (content > lo) & (content < hi)
    vals = content[mask] if np.any(mask) else content
    op_qsvs[t.name] = {
        'min': np.min(vals).reshape(qsv_shape),
        'max': np.max(vals).reshape(qsv_shape),
        'hessian': (2.0 / num_samples) * (x.T @ x),
        'num_samples': num_samples,
    }

  inputs_to_ignore = set(inputs_to_ignore or [])
  for pos, tid in enumerate(op.inputs):
    if tid >= 0 and engine.is_quantized_tensor(tensors[tid]):
      inputs_to_ignore.add(pos)
  outputs_to_ignore = set(outputs_to_ignore or [])
  for pos, tid in enumerate(op.inputs):
    if tid >= 0 and pos not in inputs_to_ignore:
      collect(tid)
  for pos, tid in enumerate(op.outputs):
    if tid >= 0 and pos not in outputs_to_ignore:
      collect(tid)
  return op_qsvs


# Hessians at or above this dimension solve ON DEVICE (f32 Cholesky on
# the MXU + Newton refinement) instead of host f64 LAPACK: Gemma-7B-class
# FFN dims (>16k) hit the host-numpy memory/time ceiling (round-1 backlog,
# docs/ROUND1_NOTES.md:121-122). Override via AEQT_GPTQ_DEVICE_SOLVE_DIM.
def _device_solve_threshold() -> int:
  import os
  return int(os.environ.get('AEQT_GPTQ_DEVICE_SOLVE_DIM', '8192'))


def _inverse_via_cholesky_host(hessian: np.ndarray,
                               damp_factor: float) -> np.ndarray:
  """H⁻¹ in f64 on host: Cholesky + LAPACK triangular inversion."""
  h = np.array(hessian, dtype=np.float64)
  diag = np.diag(h).copy()
  diag = np.where(diag != 0, diag, 1.0)
  np.fill_diagonal(h, diag + damp_factor * np.mean(diag))
  l = np.linalg.cholesky(h)
  l_inv, err = scipy.linalg.lapack.dtrtri(l, lower=True)
  if err != 0:
    raise RuntimeError(f'Triangular inversion failed (info={err}).')
  return (l_inv.T @ l_inv).astype(np.float32)


def _inverse_via_cholesky_device(hessian: np.ndarray,
                                 damp_factor: float) -> np.ndarray:
  """H⁻¹ on device via Newton–Schulz: pure MXU matmuls, no factorization.

  For SPD H (which a damped 2/n·XᵀX Hessian is), X₀ = I/‖H‖∞ gives
  spectral radius ρ(I − X₀H) < 1, and X ← 2X − X(HX) then squares the
  residual per step — ~log₂(cond) + 6 iterations to f32 convergence,
  each just two d×d matmuls. This replaces the earlier f32 Cholesky +
  triangular-solve design: XLA's blocked triangular solve at d ≥ 8k both
  compiles O(d²)-sized DUS temps (66 GiB of HLO scratch at d=16k — an
  OOM on a 16 GiB chip) and returned inaccurate inverses through this
  toolchain, while Newton–Schulz needs only ~4 d×d f32 buffers (4 GiB at
  d=32k) and runs at MXU matmul speed. Residual-checked early exit via
  lax.while_loop; the damping floor (damp_factor · mean diag) bounds the
  condition number so the iteration count stays small.
  """
  import jax

  solve = _device_ns_solver(float(damp_factor))
  x, err, it = solve(hessian)
  x = np.asarray(jax.device_get(x))
  if not np.isfinite(x).all():
    raise RuntimeError(
        f'device Hessian inverse diverged (residual {float(err):.2e} after '
        f'{int(it)} Newton-Schulz steps).')
  return x


@functools.lru_cache(maxsize=4)
def _device_ns_solver(damp_factor: float):
  """Jitted Newton-Schulz solver, cached so repeated solves (one per FC
  layer shape) reuse the compiled executable."""
  import jax
  import jax.numpy as jnp

  @jax.jit
  def solve(h):
    h = h.astype(jnp.float32)
    diag = jnp.diagonal(h)
    diag = jnp.where(diag != 0, diag, 1.0)
    damped = diag + damp_factor * jnp.mean(diag)
    h = jnp.fill_diagonal(h, damped, inplace=False)
    h = 0.5 * (h + h.T)
    # Jacobi preconditioning: iterate on Hn = D^-1/2 H D^-1/2 (unit
    # diagonal). Calibration Hessians have wildly varying diagonals
    # (2/n sum x_i^2 per input channel); normalizing slashes the
    # condition number NS has to fight in f32. X = D^-1/2 Xn D^-1/2.
    dsqrt_inv = jax.lax.rsqrt(damped)
    h = h * dsqrt_inv[:, None] * dsqrt_inv[None, :]
    inf_norm = jnp.max(jnp.sum(jnp.abs(h), axis=1))
    d = h.shape[0]
    x0 = jnp.zeros_like(h)
    x0 = jnp.fill_diagonal(x0, jnp.full((d,), 1.0, jnp.float32) / inf_norm,
                           inplace=False)

    def cond(state):
      _, err, prev_err, it = state
      converged = err <= 1e-5
      # Plateau: once err is already small, an iteration that fails to
      # halve it means the f32 floor — more steps only burn matmuls. The
      # small-err gate matters: early iterations of a large-d solve shrink
      # err SLOWLY (err ~ rho^(2^k) with rho = 1 - lambda_min/||H||inf,
      # and ||H||inf grows ~sqrt(d) after Jacobi normalization), so a
      # bare progress test fires long before the squaring regime — this
      # is exactly what froze the d=16384 solve at residual 6e-2.
      plateaued = jnp.logical_and(err < 1e-3, err > 0.5 * prev_err)
      return jnp.logical_and(
          it < 120, jnp.logical_not(jnp.logical_or(converged, plateaued)))

    # Full-f32 matmuls (bf16x6 passes on the MXU): the TPU default
    # precision accumulates bf16-grade error over d-length dot products,
    # which floors the achievable residual around 1e-1 at d=16k; HIGHEST
    # costs ~3x per matmul but buys orders of magnitude on the floor.
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def body(state):
      x, err, _, it = state
      hx = mm(h, x)
      # max|HX - I| without materializing an identity: off-diagonal max
      # vs diagonal deviation.
      derr = jnp.max(jnp.abs(jnp.diagonal(hx) - 1.0))
      oerr = jnp.max(jnp.abs(jnp.fill_diagonal(
          hx, jnp.zeros((d,), jnp.float32), inplace=False)))
      x = 2.0 * x - mm(x, hx)
      return x, jnp.maximum(derr, oerr), err, it + 1

    x, err, _, it = jax.lax.while_loop(
        cond, body, (x0, jnp.float32(1.0), jnp.float32(2.0), jnp.int32(0)))
    x = x * dsqrt_inv[:, None] * dsqrt_inv[None, :]
    return 0.5 * (x + x.T), err, it

  return solve


def _inverse_via_cholesky(hessian: np.ndarray,
                          damp_factor: float = _DAMP_FACTOR) -> np.ndarray:
  """H⁻¹ with diagonal damping (host f64 LAPACK below the device
  threshold; on-device MXU solve at Gemma-7B-scale dims)."""
  if hessian.shape[0] >= _device_solve_threshold():
    return _inverse_via_cholesky_device(hessian, damp_factor)
  return _inverse_via_cholesky_host(hessian, damp_factor)


def apply_gptq(
    weights: np.ndarray,
    quant_params: qtyping.UniformQuantParams,
    hessian: np.ndarray,
    block_size: int = _OBS_BLOCK,
) -> qtyping.UniformQuantParams:
  """Column-by-column OBS quantization with lazy error propagation.

  weights: [out, in]; hessian over the `in` dimension.
  """
  w = weights.astype(np.float32).copy()
  h_inv = _inverse_via_cholesky(hessian)
  n_cols = h_inv.shape[0]
  storage = qn.storage_dtype(quant_params.num_bits)
  q_out = np.zeros_like(w, dtype=storage)
  is_blockwise = quant_params.block_size > 0

  def column_params(col_idx: int) -> qtyping.UniformQuantParams:
    if not is_blockwise:
      return quant_params
    b = col_idx // quant_params.block_size
    return dataclasses.replace(
        quant_params,
        scale=np.asarray(quant_params.scale)[:, b],
        zero_point=np.asarray(quant_params.zero_point)[:, b],
        quantized_dimension=0,
        block_size=0,
    )

  for start in range(0, n_cols, block_size):
    end = min(start + block_size, n_cols)
    wb = w[:, start:end]
    err = np.zeros_like(wb)
    for i in range(end - start):
      col = start + i
      p = column_params(col)
      q = qn.quantize_array(wb[:, i:i + 1], p)
      dq = qn.dequantize_array(q, p).reshape(-1)
      q_out[:, col] = q.reshape(-1)
      err[:, i] = (wb[:, i] - dq) / h_inv[col, col]
      if i < end - start - 1:
        wb[:, i + 1:] -= np.outer(err[:, i], h_inv[col, col + 1:end])
    w[:, end:] -= err @ h_inv[start:end, end:]
  return dataclasses.replace(quant_params, quantized_data=q_out)


def get_tensor_quant_params(
    op_info: qtyping.OpInfo,
    tensor_quant_config: qtyping.TensorQuantizationConfig,
    tensor_content: Optional[np.ndarray] = None,
    tensor_qsv: Optional[dict[str, Any]] = None,
) -> qtyping.UniformQuantParams:
  act_qsv = tensor_qsv.get('activation_tensor_qsv') if tensor_qsv else None
  # Scale choice is orthogonal to GPTQ's Hessian-aware rounding, and the
  # weight-quality study (WEIGHT_QUALITY_r04.json) showed it dominates end
  # NLL: algorithm_params {"gptq": {"scale_algorithm": "octav"}} computes
  # the grid with OCTAV's optimal clipping before the OBS column sweep.
  # Default stays min-max (reference gptq.py parity).
  ap = op_info.op_quant_config.algorithm_params or {}
  scale_alg = (ap.get('gptq') or {}).get('scale_algorithm', 'min_max')
  if scale_alg == 'octav' and tensor_content is not None:
    from ai_edge_quantizer_tpu.algorithms.uniform import octav
    base = octav.get_tensor_quant_params(
        op_info, tensor_quant_config, tensor_content, tensor_qsv)
  else:
    base = min_max.get_tensor_quant_params(
        op_info, tensor_quant_config, tensor_content, tensor_qsv)
  if tensor_content is None:
    return base
  if act_qsv is None or 'hessian' not in act_qsv:
    return base  # no Hessian collected (e.g. activation not calibrated)
  base = dataclasses.replace(base, quantized_data=None)
  return apply_gptq(tensor_content, base, act_qsv['hessian'])
