"""Graph executor: lowers a Graph IR to jitted JAX functions.

This is the framework's runtime — the analog of the reference's LiteRT C++
interpreter, but XLA-compiled: the whole signature becomes ONE fused XLA
program (weights passed as device arrays, not baked constants).

Execution semantics for quantized graphs:
  * a tensor with quantization info is held in its integer storage dtype;
  * generic ops consume the dequantized view and their quantized outputs are
    re-quantized (simulated quantization — numerically equivalent to the
    integer kernels up to accumulator rounding);
  * FULLY_CONNECTED with integer weights takes the fused path
    (`kernels.qmatmul`): DRQ when the activation is float (dynamic act
    quantization + int8 x int8 MXU matmul), scaled-accumulator path under
    SRQ;
  * `capture_all` mode returns every tensor (the analog of LiteRT
    `preserve_all_tensors`) for calibration and validation — still one
    compiled program, no per-tensor host round-trips.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.graph import ir
from ai_edge_quantizer_tpu.execution import quant_arith
from ai_edge_quantizer_tpu.kernels import qmatmul as qmm
from ai_edge_quantizer_tpu.ops import impl as ops_impl


# Operand positions that carry graph structure (shapes, axes, strides,
# split counts) rather than data; see _eval_op.
_STRUCTURAL_OPERANDS = {
    'RESHAPE': (1,),
    'TRANSPOSE': (1,),
    'SPLIT': (0,),
    'SLICE': (1, 2),
    'STRIDED_SLICE': (1, 2, 3),
    'PAD': (1,),
    'PADV2': (1,),
    'MIRROR_PAD': (1,),
    'BROADCAST_TO': (1,),
    'RESIZE_BILINEAR': (1,),
    'RESIZE_NEAREST_NEIGHBOR': (1,),
    'MEAN': (1,),
    'SUM': (1,),
    'REDUCE_MIN': (1,),
    'CONV_2D_TRANSPOSE': (0,),
}


class GraphExecutor:
  """Executes Graph signatures as jitted functions."""

  def __init__(self, graph: ir.Graph, use_fused_kernels: bool = True,
               activation_dtype: str = 'float32'):
    """activation_dtype: 'float32' (default, bit-faithful to the offline
    pipeline) or 'bfloat16' (serving mode: all float activations — including
    KV caches — flow bf16, halving activation HBM traffic and feeding the
    MXU natively)."""
    self.graph = graph
    self.use_fused_kernels = use_fused_kernels
    self._act_dtype = quant_arith.STORAGE_JNP_DTYPES[activation_dtype]
    # Constant tensors, keyed (subgraph_idx, tensor_id), in storage dtype.
    self._weights: dict = {}
    for sg_idx, sg in enumerate(graph.subgraphs):
      for tid, t in enumerate(sg.tensors):
        if t.buffer >= 0 and graph.buffers[t.buffer].data is not None:
          data = graph.buffers[t.buffer].data
          jdtype = quant_arith.storage_dtype_of(t)
          if jdtype == jnp.int64 and not jax.config.jax_enable_x64:
            # int64 biases fit int32 on device (int64 storage is a
            # serialization-format concern, not an arithmetic one here).
            jdtype = jnp.int32
          self._weights[(sg_idx, tid)] = jnp.asarray(
              np.asarray(data).reshape(t.shape), dtype=jdtype)
    self._jit_cache: dict = {}
    # Keys of FC weights converted to packed-int4 serving layout
    # (uint8 [N, K//2], split-half; see kernels/pallas_qmatmul.py).
    self._packed_int4_keys: set = set()
    # Weight-only fusion: '<dequantized tensor id>' -> source int tensor id,
    # per subgraph. A FULLY_CONNECTED consuming the DEQUANTIZE of a constant
    # integer weight reads the integer tensor through the fused kernel
    # instead — no dequantized weight copy ever materializes at runtime.
    self._dequant_alias: dict = {}
    for sg_idx, sg in enumerate(graph.subgraphs):
      for op in sg.ops:
        if op.opcode != 'DEQUANTIZE' or not op.inputs or not op.outputs:
          continue
        src = sg.tensors[op.inputs[0]]
        if (
            src.quantization is not None
            and src.dtype in ('int2', 'int4', 'int8')
            and (sg_idx, op.inputs[0]) in self._weights
        ):
          self._dequant_alias[(sg_idx, op.outputs[0])] = op.inputs[0]

  def prepare_serving_weights(self, min_weight_params: int = 2**21) -> None:
    """Convert eligible int4 FC weights to the packed serving layout.

    Halves the HBM bytes streamed per decode step; the fused Pallas kernel
    unpacks in VMEM. Symmetric per-channel int4 FC weights only. Weights
    under `min_weight_params` stay on the XLA path — per-kernel launch
    overhead outweighs the bandwidth saving for small matrices.
    """
    for sg_idx, sg in enumerate(self.graph.subgraphs):
      fc_weight_tids = {
          op.inputs[1] for op in sg.ops
          if op.opcode == 'FULLY_CONNECTED' and len(op.inputs) > 1
          and op.inputs[1] >= 0
      }
      for tid in fc_weight_tids:
        key = (sg_idx, tid)
        t = sg.tensors[tid]
        if key not in self._weights or key in self._packed_int4_keys:
          continue
        q = t.quantization
        if (
            t.dtype != 'int4' or q is None or q.block_size != 0
            or not np.all(np.asarray(q.zero_point) == 0)
            or t.shape[-1] % 2 != 0
            or t.shape[0] % 128 != 0
            or t.num_elements < min_weight_params
        ):
          continue
        from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
        self._weights[key] = pallas_qmatmul.pack_int4_split(
            self._weights[key])
        self._packed_int4_keys.add(key)

  # -- public API -----------------------------------------------------------

  def signature_runner(self, signature_key: str = 'serving_default',
                       capture_all: bool = False):
    """A callable(inputs: dict) -> dict of outputs (or all tensors)."""
    key = (signature_key, capture_all)
    if key not in self._jit_cache:
      sig = self.graph.signature_by_key(signature_key)
      fn = functools.partial(
          self._run_signature, sig.subgraph_index, signature_key, capture_all)
      jitted = jax.jit(fn)
      self._jit_cache[key] = jitted
    jitted = self._jit_cache[key]

    def runner(inputs: dict):
      return jax.device_get(jitted(self._weights, inputs))

    runner.jitted = jitted
    runner.weights = self._weights
    return runner

  def __call__(self, inputs: dict, signature_key: str = 'serving_default'):
    return self.signature_runner(signature_key)(inputs)

  # -- evaluation -----------------------------------------------------------

  def _run_signature(self, sg_idx: int, signature_key: str,
                     capture_all: bool, weights: dict, inputs: dict):
    sig = self.graph.signature_by_key(signature_key)
    sg = self.graph.subgraphs[sg_idx]
    env: dict = {}
    for (w_sg, w_tid), arr in weights.items():
      if w_sg == sg_idx:
        env[w_tid] = arr
    for user_name, tid in sig.inputs.items():
      if user_name not in inputs:
        raise ValueError(
            f'Missing input {user_name!r} for signature {signature_key!r}; '
            f'expected {sorted(sig.inputs)}.')
      t = sg.tensors[tid]
      val = jnp.asarray(inputs[user_name])
      # Auto-quantize float inputs fed to a quantized input tensor.
      if t.quantization is not None and jnp.issubdtype(
          val.dtype, jnp.floating):
        val = quant_arith.quantize(
            val, t.quantization, quant_arith.storage_dtype_of(t))
      elif t.dtype == 'float32' and val.dtype != self._act_dtype:
        val = val.astype(self._act_dtype)
      env[tid] = val

    for op in sg.ops:
      self._eval_op(sg_idx, sg, op, env)

    if capture_all:
      return {
          t.name: env[tid]
          for tid, t in enumerate(sg.tensors)
          if tid in env
      }
    return {name: env[tid] for name, tid in sig.outputs.items()}

  def _dequant_view(self, sg: ir.Subgraph, tid: int, env: dict):
    t = sg.tensors[tid]
    val = env[tid]
    if t.quantization is not None and not jnp.issubdtype(
        val.dtype, jnp.floating):
      return quant_arith.dequantize(val, t.quantization,
                                    out_dtype=self._act_dtype)
    return val

  def _eval_op(self, sg_idx: int, sg: ir.Subgraph, op: ir.Op,
               env: dict) -> None:
    ctx = ops_impl.OpContext(op=op, subgraph=sg, graph=self.graph)
    opcode = op.opcode

    if opcode in ('QUANTIZE', 'DEQUANTIZE'):
      # Pure storage conversions: dequant view of input, output conversion
      # below re-quantizes when the output tensor carries params.
      val = self._dequant_view(sg, op.inputs[0], env)
      self._store_outputs(sg, op, (val,), env)
      return

    if (
        self.use_fused_kernels
        and opcode == 'FULLY_CONNECTED'
        and len(op.inputs) > 1
        and (sg_idx, op.inputs[1]) in self._dequant_alias
    ):
      # Weight-only fusion: read the integer weight directly; the explicit
      # dequantized copy is dead code under jit (XLA DCE).
      op = ir.Op(
          opcode=op.opcode,
          inputs=[op.inputs[0],
                  self._dequant_alias[(sg_idx, op.inputs[1])]]
          + list(op.inputs[2:]),
          outputs=op.outputs, attrs=op.attrs)
      ctx = ops_impl.OpContext(op=op, subgraph=sg, graph=self.graph)
      self._eval_quantized_fc(ctx, sg, op, env, weight_only=True)
      return

    if (
        self.use_fused_kernels
        and opcode == 'FULLY_CONNECTED'
        and self._fc_weight_is_integer(sg, op)
    ):
      self._eval_quantized_fc(ctx, sg, op, env)
      return

    if (
        self.use_fused_kernels
        and opcode == 'EMBEDDING_LOOKUP'
        and len(op.inputs) > 1
        and sg.tensors[op.inputs[1]].quantization is not None
        and sg.tensors[op.inputs[1]].quantization.block_size == 0
        and sg.tensors[op.inputs[1]].quantization.quantized_dimension
        in (0, None)
    ):
      # Gather int rows FIRST, dequantize only the gathered rows — never
      # materialize a dequantized copy of the whole table.
      ids = env[op.inputs[0]].astype(jnp.int32)
      table_t = sg.tensors[op.inputs[1]]
      rows = jnp.take(env[op.inputs[1]], ids, axis=0)
      q = table_t.quantization
      scale = jnp.asarray(np.asarray(q.scale, np.float32).reshape(-1))
      zp = jnp.asarray(np.asarray(q.zero_point).reshape(-1).astype(np.int32))
      if scale.size == 1:
        out = (rows.astype(jnp.float32) - zp[0]) * scale[0]
      else:
        # Per-row (vocab-dim) params gather alongside the rows.
        row_scale = jnp.take(scale, ids, axis=0)[..., None]
        row_zp = jnp.take(zp, ids, axis=0)[..., None]
        out = (rows.astype(jnp.float32) - row_zp) * row_scale
      self._store_outputs(sg, op, (out,), env)
      return

    impl_fn = ops_impl.OPS.get(opcode)
    if impl_fn is None:
      raise NotImplementedError(f'No executor impl for op {opcode!r}.')
    structural = _STRUCTURAL_OPERANDS.get(opcode, ())
    args = []
    for pos, tid in enumerate(op.inputs):
      if tid < 0:
        continue  # absent optional operand (e.g. bias)
      t = sg.tensors[tid]
      if pos in structural and t.buffer >= 0 and \
          self.graph.buffers[t.buffer].data is not None:
        # Structural operands (shapes/axes/strides) must be CONCRETE at
        # trace time — read from the graph, never from traced args.
        args.append(np.asarray(
            self.graph.buffers[t.buffer].data).reshape(t.shape))
      else:
        args.append(self._dequant_view(sg, tid, env))
    result = impl_fn(ctx, *args)
    if not isinstance(result, tuple):
      result = (result,)
    self._store_outputs(sg, op, result, env)

  def _store_outputs(self, sg: ir.Subgraph, op: ir.Op, values: tuple,
                     env: dict) -> None:
    for tid, val in zip(op.outputs, values):
      t = sg.tensors[tid]
      if t.quantization is not None:
        if jnp.issubdtype(val.dtype, jnp.floating):
          val = quant_arith.quantize(
              val, t.quantization, quant_arith.storage_dtype_of(t))
      elif t.dtype == 'float32' and val.dtype != self._act_dtype:
        val = val.astype(self._act_dtype)
      env[tid] = val

  # -- quantized FULLY_CONNECTED fast paths ---------------------------------

  def _fc_weight_is_integer(self, sg: ir.Subgraph, op: ir.Op) -> bool:
    w_tid = op.inputs[1]
    if w_tid < 0:
      return False
    w = sg.tensors[w_tid]
    return w.quantization is not None and w.dtype in (
        'int2', 'int4', 'int8')

  def _eval_quantized_fc(self, ctx, sg: ir.Subgraph, op: ir.Op,
                         env: dict, weight_only: bool = False) -> None:
    x_t = sg.tensors[op.inputs[0]]
    w_t = sg.tensors[op.inputs[1]]
    b_tid = op.inputs[2] if len(op.inputs) > 2 else -1
    w_q = env[op.inputs[1]]
    q = w_t.quantization
    bias = None
    if b_tid >= 0:
      bias = self._dequant_view(sg, b_tid, env)

    sg_idx = next(i for i, s_ in enumerate(self.graph.subgraphs)
                  if s_ is sg)
    if (sg_idx, op.inputs[1]) in self._packed_int4_keys:
      from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
      x_f = self._dequant_view(sg, op.inputs[0], env)
      y = pallas_qmatmul.qmatmul_pallas_int4_packed(
          x_f, w_q, jnp.asarray(np.asarray(q.scale, np.float32)), bias=bias)
      y = ops_impl._fused_activation(
          y, op.attrs.get('fused_activation', 'NONE'))
      self._store_outputs(sg, op, (y,), env)
      return

    x_val = env[op.inputs[0]]
    symmetric = bool(np.all(np.asarray(q.zero_point) == 0))
    if x_t.quantization is None:
      if weight_only:
        # Weight-only: float math against fused-dequantized weights (no
        # activation quantization noise).
        y = qmm.qmatmul(
            x_val, w_q, jnp.asarray(q.scale),
            zero_point=None if symmetric else jnp.asarray(q.zero_point),
            bias=bias, block_size=q.block_size,
            prefer_pallas=False)
      # DRQ: float activation quantized dynamically on device.
      elif symmetric and q.block_size == 0:
        y = qmm.drq_matmul_ref(x_val, w_q, jnp.asarray(q.scale), bias=bias)
      else:
        y = qmm.qmatmul(
            x_val, w_q, jnp.asarray(q.scale),
            zero_point=None if symmetric else jnp.asarray(q.zero_point),
            bias=bias, block_size=q.block_size)
    else:
      # SRQ: integer activation; scaled-accumulator path.
      x_f = quant_arith.dequantize(x_val, x_t.quantization)
      y = qmm.qmatmul(
          x_f, w_q, jnp.asarray(q.scale),
          zero_point=None if symmetric else jnp.asarray(q.zero_point),
          bias=bias, block_size=q.block_size)
    y = ops_impl._fused_activation(
        y, op.attrs.get('fused_activation', 'NONE'))
    self._store_outputs(sg, op, (y,), env)
