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
import logging
import os

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
    self._packed_pad_n: dict = {}  # key -> true N (packed weight N-padded)
    self._packed_scale: dict = {}  # key -> padded per-channel scale
    self._packed_block_size: dict = {}  # key -> block size (blockwise int4)
    # RMS_NORM -> packed-FC fusion (serving): (sg, norm_out_tid) -> info.
    self._norm_fusions: dict = {}
    # GeGLU MLP chain -> one megakernel: (sg, gate_up op idx) -> info.
    self._mlp_fusions: dict = {}
    self._mlp_skip: set = set()
    # Greedy head: FC(logits) -> ARG_MAX fused into one vocab-tiled
    # kernel (the [B, vocab] logits tensor never reaches HBM).
    self._head_fusions: dict = {}
    self._head_skip: set = set()
    self._norm_skip: set = set()
    # Attention-block serving fusions (AEQT_ATTN_BLOCK=1): norm+QKV+rope
    # prologue and attention out-proj+residual epilogue.
    self._qkv_fusions: dict = {}
    self._qkv_skip: set = set()
    # MoE expert-parallel fusion: whole routed-FFN groups (built by
    # models/gemma.py with 'moe_group' op attrs) dispatch to
    # parallel/moe.py over an 'ep' mesh axis. Engaged by set_mesh().
    self._moe_fusions: dict = {}
    self._moe_skip: set = set()
    self._mesh = None
    # Fused decode-block units (AEQT_DECODE_BLOCK=1; see
    # _find_block_fusions): MLP(l-1)+QKV(l)+attention(l) megakernel.
    self._block_fusions: dict = {}
    self._block_skip: set = set()
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
    # int8-KV-cache attention fusion: the BMM->MUL->ADD->SOFTMAX->BMM chain
    # over per-tensor-quantized caches collapses into one fused kernel
    # (kernels/pallas_attention.py). Maps (sg_idx, chain start op index) ->
    # fusion record; ops inside a chain are skipped during evaluation.
    self._attn_fusions: dict = {}
    self._attn_skip: set = set()
    if use_fused_kernels:
      for sg_idx, sg in enumerate(graph.subgraphs):
        self._find_attention_fusions(sg_idx, sg)

  def _find_attention_fusions(self, sg_idx: int, sg: ir.Subgraph) -> None:
    """Producer-chasing match of BMM->MUL->ADD->SOFTMAX->BMM over int8
    caches (DEQUANTIZE ops inserted by the rewrite are looked through)."""
    ops = sg.ops
    producer_of = {}
    for i, o in enumerate(ops):
      for tid in o.outputs:
        producer_of[tid] = i

    def consumers_of(tid):
      return [i for i, o in enumerate(ops) if tid in o.inputs]

    def int8_per_tensor_cache(tid):
      t = sg.tensors[tid]
      q = t.quantization
      return (
          t.dtype == 'int8' and q is not None and q.block_size == 0
          and np.asarray(q.scale).size == 1
          and np.asarray(q.zero_point).size == 1
          and len(t.shape) == 4
      )

    def cache_source(tid):
      """Resolve through a DEQUANTIZE to the int8 cache tensor, if any."""
      p = producer_of.get(tid)
      if p is not None and ops[p].opcode == 'DEQUANTIZE':
        src = ops[p].inputs[0]
        if int8_per_tensor_cache(src):
          return src
      if int8_per_tensor_cache(tid):
        return tid
      return None

    for sm_idx, sm in enumerate(ops):
      if sm.opcode != 'SOFTMAX':
        continue
      add_idx = producer_of.get(sm.inputs[0])
      if add_idx is None or ops[add_idx].opcode != 'ADD':
        continue
      add = ops[add_idx]
      mul_idx = producer_of.get(add.inputs[0])
      if mul_idx is None or ops[mul_idx].opcode != 'MUL':
        continue
      mul = ops[mul_idx]
      bmm1_idx = producer_of.get(mul.inputs[0])
      if bmm1_idx is None or ops[bmm1_idx].opcode != 'BATCH_MATMUL':
        continue
      bmm1 = ops[bmm1_idx]
      if not bmm1.attrs.get('adj_y'):
        continue
      sm_consumers = consumers_of(sm.outputs[0])
      if len(sm_consumers) != 1:
        continue
      bmm2_idx = sm_consumers[0]
      bmm2 = ops[bmm2_idx]
      if (
          bmm2.opcode != 'BATCH_MATMUL' or bmm2.attrs.get('adj_y')
          or bmm2.inputs[0] != sm.outputs[0]
      ):
        continue
      k_tid = cache_source(bmm1.inputs[1])
      v_tid = cache_source(bmm2.inputs[1])
      if k_tid is None or v_tid is None:
        continue
      q_tid = bmm1.inputs[0]
      if len(sg.tensors[q_tid].shape) != 4:
        continue
      scale_t = sg.tensors[mul.inputs[1]]
      scale_data = (
          self.graph.buffers[scale_t.buffer].data
          if scale_t.buffer >= 0 else None)
      if scale_data is None or np.asarray(scale_data).size != 1:
        continue
      mask_tid = add.inputs[1]
      chain_outs = [bmm1.outputs[0], mul.outputs[0], add.outputs[0],
                    sm.outputs[0]]
      if any(len(consumers_of(t)) != 1 or t in sg.outputs
             for t in chain_outs):
        continue
      if any(sg.tensors[t].quantization is not None for t in chain_outs):
        continue  # SRQ'd intermediates: keep the faithful simulated path.
      h = sg.tensors[q_tid].shape[-1]
      fusion = {
          'q': q_tid, 'k': k_tid, 'v': v_tid, 'mask': mask_tid,
          'out': bmm2.outputs[0],
          # The kernel divides by sqrt(h); fold the graph's score-scale
          # constant in so arbitrary constants stay exact.
          'k_scale_factor': float(np.asarray(scale_data).reshape(())) *
          float(h) ** 0.5,
      }
      self._attn_fusions[(sg_idx, bmm2_idx)] = fusion
      skip = [bmm1_idx, mul_idx, add_idx, sm_idx]

      def match_cache_dus(cache_tid, chain_idx=(bmm1_idx, bmm2_idx)):
        """The per-step KV row write folds into the attention dispatch
        when the cache tensor is produced by a one-row same-params DUS
        whose pre-update value dies there (its buffer is donated to the
        kernel's aliased cache output). Returns (dus_idx, extra_skips,
        record) or None."""
        p = producer_of.get(cache_tid)
        if p is None or ops[p].opcode != 'DYNAMIC_UPDATE_SLICE':
          return None
        dus = ops[p]
        if len(dus.inputs) < 3:
          return None
        operand_tid, update_tid, starts_tid = dus.inputs[:3]
        if not self._same_int_params(sg, operand_tid, update_tid,
                                     cache_tid):
          return None
        osh = sg.tensors[operand_tid].shape
        ush = sg.tensors[update_tid].shape
        if (len(osh) != 4 or len(ush) != 4 or ush[2] != 1
            or [ush[0], ush[1], ush[3]] != [osh[0], osh[1], osh[3]]):
          return None  # one-row cache update only
        # (tile/lane alignment is checked at dispatch; misaligned shapes
        # take the XLA-DUS fallback inside the fused eval)
        if not self._sole_consumer(sg, operand_tid, dus):
          return None
        # Every consumer of the post-update cache must be inside the
        # fused chain (the fusion produces its value only at bmm2).
        extra = []
        for ci in consumers_of(cache_tid):
          if ci in chain_idx:
            continue
          if (ops[ci].opcode == 'DEQUANTIZE'
              and ops[ci].outputs[0] not in sg.outputs
              and all(cj in chain_idx
                      for cj in consumers_of(ops[ci].outputs[0]))):
            extra.append(ci)
            continue
          return None
        return p, extra, {
            'operand': operand_tid, 'update': update_tid,
            'starts': starts_tid, 'out': cache_tid,
        }

      if os.environ.get('AEQT_ATTN_WRITEBACK', '0') == '1':
        k_wb = match_cache_dus(k_tid)
        v_wb = match_cache_dus(v_tid)
        if k_wb is not None and v_wb is not None:
          fusion['writeback'] = {'k': k_wb[2], 'v': v_wb[2]}
          skip += [k_wb[0], v_wb[0]] + k_wb[1] + v_wb[1]
      for j in skip:
        self._attn_skip.add((sg_idx, j))

  def prepare_serving_weights(self, min_weight_params: int = 2**21) -> None:
    """Convert eligible int4 FC weights to the packed serving layout.

    Halves the HBM bytes streamed per decode step; the fused Pallas kernel
    unpacks in VMEM. Symmetric per-channel int4 FC weights only. Weights
    under `min_weight_params` stay on the XLA path — per-kernel launch
    overhead outweighs the bandwidth saving for small matrices.
    """
    # Buffer-shared packing: multi-signature graphs alias one weight
    # store, so each BUFFER packs once and every (sg, tid) view shares
    # the packed array (a per-key pack held one HBM copy per signature —
    # 3x the weight footprint on prefill+tail+decode serving graphs).
    packed_by_buffer: dict = {}
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
        if t.buffer >= 0 and t.buffer in packed_by_buffer:
          packed, scale_arr, pad_n, bs = packed_by_buffer[t.buffer]
          self._weights[key] = packed
          self._packed_scale[key] = scale_arr
          if pad_n is not None:
            self._packed_pad_n[key] = pad_n
          if bs:
            self._packed_block_size[key] = bs
          self._packed_int4_keys.add(key)
          continue
        q = t.quantization
        # Packed blockwise needs lane-aligned byte blocks: byte columns
        # per block == block_size, and Mosaic requires >=128 lanes per
        # tile. Smaller blocks (32/64) serve via the XLA blockwise path.
        blockwise_ok = (
            q is not None and q.block_size > 0
            and q.block_size % 128 == 0
            and (t.shape[-1] // q.block_size) % 2 == 0
            and (t.shape[-1] // 2) % q.block_size == 0
        )
        if (
            t.dtype != 'int4' or q is None
            or not (q.block_size == 0 or blockwise_ok)
            or not np.all(np.asarray(q.zero_point) == 0)
            or t.shape[-1] % 2 != 0
            or t.shape[0] % 128 != 0
            or t.num_elements < min_weight_params
        ):
          continue
        from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
        packed = pallas_qmatmul.pack_int4_split(self._weights[key])
        n = int(t.shape[0])
        if q.block_size > 0:
          nb = int(t.shape[-1]) // q.block_size
          scale = np.asarray(q.scale, np.float32).reshape(n, nb)
          self._packed_block_size[key] = int(q.block_size)
        else:
          scale = np.asarray(q.scale, np.float32).reshape(-1)
        # Pad N to a 512 multiple once at prep time: a 512-wide N-tile cuts
        # the grid-step count 4x vs the 128 fallback (the full-vocab logits
        # head, N=256128, is the motivating case — 0.15% pad rows). The
        # fast path slices the padded columns back off. Mid-size weights
        # that already tile at 256 keep their exact N (bn=512 only pays
        # off at vocab scale; see the measured table in ROUND1_NOTES).
        if n % 256 == 0 and n < 65536:
          n_pad = n
        else:
          n_pad = -(-n // 512) * 512
        if n_pad != n:
          packed = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
          pad_spec = ((0, n_pad - n),) + ((0, 0),) * (scale.ndim - 1)
          scale = np.pad(scale, pad_spec)
          self._packed_pad_n[key] = n
        self._weights[key] = packed
        self._packed_scale[key] = jnp.asarray(scale)
        self._packed_int4_keys.add(key)
        if t.buffer >= 0:
          packed_by_buffer[t.buffer] = (
              packed, self._packed_scale[key],
              self._packed_pad_n.get(key),
              self._packed_block_size.get(key, 0))
    self._find_norm_fusions()
    self._find_mlp_fusions()
    self._find_head_fusions()
    self._find_qkv_fusions()
    self._find_attn_epilogues()
    self._find_block_fusions()

  def _find_block_fusions(self) -> None:
    """Merge MLP(l-1)+norms+QKV(l)+RoPE+attention(l) units into ONE
    pallas_call (kernels/pallas_block.py) per layer.

    Opt-in via AEQT_DECODE_BLOCK=1 (requires AEQT_ATTN_WRITEBACK-matched
    attention fusions so the cache DUS already sits off the attention
    path). The merged kernel ring-buffers the layer's cache DMA during
    the MLP MXU phase — the overlap neither kernel can get alone, since
    TPU kernels serialize (DECODE_PROFILE r04: attention DMA-bound at
    ~745 GB/s while MLP holds the MXU at 82% peak). Decode shape only:
    NK == 1, T == 1, fused qkv projection, packed int4 weights.
    """
    self._block_fusions: dict = {}
    self._block_skip: set = set()
    if os.environ.get('AEQT_DECODE_BLOCK', '0') != '1':
      return

    for (sg_idx, bmm2_idx), attn in list(self._attn_fusions.items()):
      wb = attn.get('writeback')
      if wb is None or attn.get('epilogue') is not None:
        continue
      sg = self.graph.subgraphs[sg_idx]
      ops = sg.ops
      q_tid = attn['q']
      if sg.tensors[q_tid].shape[1] != 1:  # NK == 1 only
        continue

      def producer(tid):
        p = ir.tensor_producer(sg, tid)
        return (p, ops[p]) if p is not None and p >= 0 else (None, None)

      def walk(tid, opcodes):
        """Walk producers back through `opcodes`; returns (ops, final)."""
        seen = []
        for code in opcodes:
          p, op = producer(tid)
          if op is None or op.opcode != code:
            return None, None
          seen.append(p)
          tid = op.inputs[0]
        return seen, tid

      # q chain: q_grouped <- RESHAPE <- TRANSPOSE <- ROPE <- RESHAPE <-
      # SLICE(qkv) <- FC(xn2, wqkv).
      q_ops, q4_tid = walk(q_tid, ('RESHAPE', 'TRANSPOSE'))
      if q_ops is None:
        continue
      rope_idx, rope_op = producer(q4_tid)
      if rope_op is None or rope_op.opcode != 'ROPE':
        continue
      positions_tid = rope_op.inputs[1]
      rope_base = float((rope_op.attrs or {}).get('rope_base', 10000.0))
      slice_ops, qkv_tid = walk(rope_op.inputs[0], ('RESHAPE', 'SLICE'))
      if slice_ops is None:
        continue
      fc_idx, fc_op = producer(qkv_tid)
      if fc_op is None or fc_op.opcode != 'FULLY_CONNECTED':
        continue
      wqkv_key = (sg_idx, fc_op.inputs[1])
      if wqkv_key not in self._packed_int4_keys:
        continue
      norm_idx, norm_op = producer(fc_op.inputs[0])
      if norm_op is None or norm_op.opcode != 'RMS_NORM':
        continue
      g2_tid = norm_op.inputs[1]
      eps2 = float((norm_op.attrs or {}).get('epsilon', 1e-6))
      x_ffn_tid = norm_op.inputs[0]

      # k chain: wb update <- TRANSPOSE <- ROPE <- RESHAPE <- SLICE(qkv)
      k_ops, k4_tid = walk(wb['k']['update'], ('TRANSPOSE',))
      if k_ops is None:
        continue
      krope_idx, krope_op = producer(k4_tid)
      if krope_op is None or krope_op.opcode != 'ROPE':
        continue
      kslice_ops, k_src = walk(krope_op.inputs[0], ('RESHAPE', 'SLICE'))
      if kslice_ops is None or k_src != qkv_tid:
        continue
      # v chain: TRANSPOSE <- RESHAPE <- SLICE(qkv)
      v_ops, v_src = walk(wb['v']['update'],
                          ('TRANSPOSE', 'RESHAPE', 'SLICE'))
      if v_ops is None or v_src != qkv_tid:
        continue

      # The FFN residual of l-1: x_ffn = ADD(x_res, mlp_down_out).
      add_idx, add_op = producer(x_ffn_tid)
      if add_op is None or add_op.opcode != 'ADD':
        continue
      mlp = None
      mlp_key = None
      x_res_tid = None
      for cand_res, cand_down in (add_op.inputs[:2],
                                  add_op.inputs[:2][::-1]):
        for key, info in self._mlp_fusions.items():
          if key[0] == sg_idx and info['out'] == cand_down:
            mlp, mlp_key, x_res_tid = info, key, cand_res
            break
        if mlp is not None:
          break
      if mlp is None or mlp.get('wgu_split') is not None:
        continue
      # mlp['x'] is the pre-FFN-norm OUTPUT; fold the norm in.
      n1_idx, n1_op = producer(mlp['x'])
      if n1_op is None or n1_op.opcode != 'RMS_NORM' \
          or n1_op.inputs[0] != x_res_tid:
        continue
      g1_tid = n1_op.inputs[1]
      eps1 = float((n1_op.attrs or {}).get('epsilon', 1e-6))

      k_info = sg.tensors[attn['k']].quantization
      v_info = sg.tensors[attn['v']].quantization
      ku_info = sg.tensors[wb['k']['update']].quantization
      vu_info = sg.tensors[wb['v']['update']].quantization
      if any(i is None for i in (k_info, v_info, ku_info, vu_info)):
        continue

      first_idx = min(n1_idx, mlp_key[1])
      record = {
          'x_res': x_res_tid,
          'g1': g1_tid, 'eps': eps1,
          'mlp': mlp,
          'g2': g2_tid,
          'wqkv_key': wqkv_key,
          'positions': positions_tid,
          'rope_base': rope_base,
          'nq': sg.tensors[q_tid].shape[2],
          'head_dim': sg.tensors[q_tid].shape[3],
          'x_ffn_out': x_ffn_tid,
          'ctx_out': attn['out'],
          'mask': attn['mask'],
          'wb': wb,
          'k_scale_eff': float(np.asarray(k_info.scale).reshape(()))
          * attn['k_scale_factor'],
          'v_scale': float(np.asarray(v_info.scale).reshape(())),
          'zp_k': float(np.asarray(k_info.zero_point).reshape(())),
          'zp_v': float(np.asarray(v_info.zero_point).reshape(())),
          'kq_scale': float(np.asarray(ku_info.scale).reshape(())),
          'vq_scale': float(np.asarray(vu_info.scale).reshape(())),
      }
      # Ops absorbed into the unit (the attention chain's skip set was
      # already registered by _find_attention_fusions).
      # (the MLP chain's interior ops stay in _mlp_skip; only the
      # gate_up FC — the absorbed fusion's key op — needs skipping here)
      unit_ops = ([n1_idx, add_idx, norm_idx, fc_idx, rope_idx,
                   krope_idx, bmm2_idx]
                  + q_ops + slice_ops + k_ops + kslice_ops + v_ops)
      self._block_fusions[(sg_idx, first_idx)] = record
      for oi in unit_ops:
        self._block_skip.add((sg_idx, oi))
      self._block_skip.add(mlp_key)
      del self._mlp_fusions[mlp_key]
      del self._attn_fusions[(sg_idx, bmm2_idx)]
      # The folded norms must not re-engage their own fusions.
      self._norm_skip.discard((sg_idx, n1_idx))
      self._norm_skip.discard((sg_idx, norm_idx))
      self._norm_fusions.pop((sg_idx, fc_op.inputs[0]), None)
      self._norm_fusions.pop((sg_idx, mlp['x']), None)

  def _eval_fused_block(self, sg_idx: int, sg: ir.Subgraph,
                        fusion: dict, env: dict) -> None:
    """One fused MLP+QKV+attention dispatch for a matched unit."""
    from ai_edge_quantizer_tpu.kernels import pallas_block
    x_res = self._dequant_view(sg, fusion['x_res'], env)
    b = x_res.shape[0]
    h = fusion['head_dim']
    nq = fusion['nq']
    mask = self._dequant_view(sg, fusion['mask'], env)
    lengths = jnp.sum((mask[:, 0, 0, :] > -1e8).astype(jnp.int32),
                      axis=-1)
    positions = env[fusion['positions']]
    half = h // 2
    freqs = jnp.asarray(
        fusion['rope_base']
        ** (-np.arange(0, half, dtype=np.float32) / half))
    ang = positions[:, 0, None].astype(jnp.float32) * freqs
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    mlp = fusion['mlp']
    wb = fusion['wb']
    k_pool = env[wb['k']['operand']]
    v_pool = env[wb['v']['operand']]
    s = k_pool.shape[2]
    starts = env[wb['k']['starts']]
    pos = starts[2].astype(jnp.int32)
    # s % 32 == 0: in-kernel dirty-tile writeback (no XLA DUS at all);
    # otherwise the kernel returns the pools untouched and the DUS runs
    # here.
    wb_in_kernel = (s % 32 == 0
                    and os.environ.get('AEQT_BLOCK_WRITEBACK', '1') == '1'
                    and jax.default_backend() == 'tpu')
    ctx, x_ffn, k_new, v_new, k_out, v_out = (
        pallas_block.fused_mlp_qkv_attention(
            x_res.reshape(b, -1).astype(jnp.float32),
            self._dequant_view(sg, fusion['g1'], env).reshape(-1),
            env[mlp['wgu_key'][1]],
            self._packed_scale[mlp['wgu_key']],
            env[mlp['wd_grouped_tid']],
            self._packed_scale[mlp['wd_key']],
            self._dequant_view(sg, fusion['g2'], env).reshape(-1),
            env[fusion['wqkv_key'][1]],
            self._packed_scale[fusion['wqkv_key']],
            cos, sin,
            k_pool.reshape(b, s, h), v_pool.reshape(b, s, h), lengths,
            pos,
            fusion['k_scale_eff'], fusion['v_scale'],
            fusion['kq_scale'], fusion['vq_scale'], nq,
            k_zero_point=fusion['zp_k'], v_zero_point=fusion['zp_v'],
            act=mlp['act'], eps=fusion['eps'],
            compute=os.environ.get('AEQT_ATTN_COMPUTE', 'f32'),
            bf=mlp['bf'],
            bb=int(os.environ.get('AEQT_ATTN_BB', '8')),
            ring=int(os.environ.get('AEQT_BLOCK_RING', '8')),
            writeback=wb_in_kernel,
            interpret=jax.default_backend() != 'tpu'))
    # Residual stream + attention context to their graph tensors.
    env[fusion['x_ffn_out']] = x_ffn.astype(self._act_dtype).reshape(
        sg.tensors[fusion['x_ffn_out']].shape)
    out_op = ir.Op(opcode='BATCH_MATMUL', inputs=[],
                   outputs=[fusion['ctx_out']])
    self._store_outputs(
        sg, out_op, (ctx.reshape(sg.tensors[fusion['ctx_out']].shape),),
        env)
    if wb_in_kernel:
      env[wb['k']['out']] = k_out.reshape(k_pool.shape)
      env[wb['v']['out']] = v_out.reshape(v_pool.shape)
      return
    # Fallback: cache writes in XLA (stale-mode contract).
    for side, new in (('k', k_new), ('v', v_new)):
      info = wb[side]
      operand = env[info['operand']]
      upd = new.reshape(b, 1, 1, h).astype(operand.dtype)
      env[info['out']] = jax.lax.dynamic_update_slice(
          operand, upd,
          tuple(starts[i].astype(jnp.int32) for i in range(operand.ndim)))

  def set_mesh(self, mesh) -> None:
    """Enable expert-parallel dispatch of MoE FFN groups over `mesh`.

    When the mesh has an 'ep' axis, every MoE group emitted by
    models/gemma.py (ops tagged with 'moe_group' attrs) is replaced by
    one parallel/moe.py call: the quantized per-expert weights stack
    into [E, ...] arrays placed P('ep') (each device holds E/ep experts'
    int weights + scales), gating runs replicated, and one psum over
    'ep' combines — activations move once, expert weights never do.
    """
    self._mesh = mesh
    self._find_moe_fusions()

  def _find_moe_fusions(self) -> None:
    import numpy as _np
    from jax.sharding import NamedSharding, PartitionSpec as P
    self._moe_fusions = {}
    self._moe_skip = set()
    if self._mesh is None or 'ep' not in self._mesh.shape:
      return
    ep = self._mesh.shape['ep']
    for sg_idx, sg in enumerate(self.graph.subgraphs):
      groups: dict = {}
      for op_idx, op in enumerate(sg.ops):
        grp = (op.attrs or {}).get('moe_group')
        if grp is not None:
          groups.setdefault(grp, []).append((op_idx, op))
      for grp, ops in groups.items():
        roles = {}
        for op_idx, op in ops:
          role = (op.attrs or {}).get('moe_role')
          if role:
            roles[role] = (op_idx, op)
        if 'router' not in roles or 'gates' not in roles \
            or 'combine' not in roles:
          continue
        n_experts = sum(1 for r in roles if r.startswith('expert_gate_'))
        if n_experts == 0 or n_experts % ep:
          continue
        router_op = roles['router'][1]

        def stack(kind):
          tids = [roles[f'expert_{kind}_{e}'][1].inputs[1]
                  for e in range(n_experts)]
          qs = [sg.tensors[t].quantization for t in tids]
          if any(q is None for q in qs):
            return None
          w = jnp.stack([jnp.asarray(
              self._weights[(sg_idx, t)]) for t in tids])
          s = jnp.stack([jnp.asarray(_np.asarray(q.scale).reshape(-1),
                                     jnp.float32) for q in qs])
          shard = NamedSharding(self._mesh, P('ep'))
          return (jax.device_put(w, shard), jax.device_put(s, shard))

        stacked = {kind: stack(kind) for kind in ('gate', 'up', 'down')}
        if any(v is None for v in stacked.values()):
          continue  # engaged only for quantized expert banks
        skip_idx = [op_idx for op_idx, op in ops if op is not router_op]
        fusion = {
            'fn': router_op.inputs[0],
            'logits': router_op.outputs[0],
            'out': roles['combine'][1].outputs[0],
            'k': int((roles['gates'][1].attrs or {}).get('moe_top_k', 2)),
            'stacked': stacked,
        }
        self._moe_fusions[(sg_idx, min(skip_idx))] = fusion
        for oi in skip_idx:
          self._moe_skip.add((sg_idx, oi))

  def _eval_fused_moe(self, sg_idx: int, sg: ir.Subgraph,
                      fusion: dict, env: dict) -> None:
    """One parallel/moe.py dispatch for a matched routed-FFN group."""
    from ai_edge_quantizer_tpu.parallel import moe
    x = self._dequant_view(sg, fusion['fn'], env)
    logits = self._dequant_view(sg, fusion['logits'], env)
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    l2 = logits.reshape(-1, logits.shape[-1])
    st = fusion['stacked']
    fn = moe.make_moe_ffn(self._mesh, k=fusion['k'])
    y2 = fn(x2, l2, st['gate'][0], st['gate'][1], st['up'][0],
            st['up'][1], st['down'][0], st['down'][1])
    y = y2.reshape(lead + (d,)).astype(x.dtype)
    out_op = ir.Op(opcode='ADD', inputs=[], outputs=[fusion['out']])
    self._store_outputs(sg, out_op, (y,), env)

  def _find_norm_fusions(self) -> None:
    """RMS_NORM ops whose output feeds ONLY packed channelwise FCs fold
    into the matmul kernel (norm recomputed per N-tile in VMEM; the
    standalone norm op and its HBM round trip disappear).

    Opt-in via AEQT_NORM_FUSION=1: the fused kernel measured SLOWER than
    plain packed matmul at small m on v5e (the in-kernel f32 norm breaks
    the bf16 MXU pipelining) — kept for shapes where it wins.
    """
    self._norm_fusions = {}
    self._norm_skip = set()
    import os
    if os.environ.get('AEQT_NORM_FUSION', '0') != '1':
      return
    sig_out_tids = {
        (s.subgraph_index, tid)
        for s in self.graph.signatures for tid in s.outputs.values()
    }
    for sg_idx, sg in enumerate(self.graph.subgraphs):
      for op_idx, op in enumerate(sg.ops):
        if op.opcode != 'RMS_NORM' or len(op.inputs) < 2 or not op.outputs:
          continue
        out_tid = op.outputs[0]
        if out_tid in sg.outputs or (sg_idx, out_tid) in sig_out_tids:
          continue
        gamma_tid = op.inputs[1]
        g_t = sg.tensors[gamma_tid]
        if g_t.buffer < 0 or self.graph.buffers[g_t.buffer].data is None:
          if (sg_idx, gamma_tid) not in self._weights:
            continue
        consumers = [o for o in sg.ops if out_tid in o.inputs]
        if not consumers or not all(
            o.opcode == 'FULLY_CONNECTED'
            and o.inputs and o.inputs[0] == out_tid
            and len(o.inputs) > 1
            and (sg_idx, o.inputs[1]) in self._packed_int4_keys
            and (sg_idx, o.inputs[1]) not in self._packed_block_size
            for o in consumers
        ):
          continue
        self._norm_fusions[(sg_idx, out_tid)] = {
            'x': op.inputs[0],
            'gamma': gamma_tid,
            'eps': float(op.attrs.get('epsilon', 1e-6)),
        }
        self._norm_skip.add((sg_idx, op_idx))

  def _find_mlp_fusions(self) -> None:
    """Fuse the GeGLU FFN chain into ONE Pallas megakernel call.

    Patterns (the reference's GenAI FFN; models/gemma.py both layouts):
      A. FULLY_CONNECTED(gate_up) -> SLICE(gate), SLICE(up)
           -> GELU(gate) -> MUL(gelu, up) -> FULLY_CONNECTED(down)
      B. FULLY_CONNECTED(gate), FULLY_CONNECTED(up) on the same input
           -> GELU(gate) -> MUL(gelu, up) -> FULLY_CONNECTED(down)
         (the two projection weights are concatenated row-wise into a
         synthetic gate_up weight at prepare time)
    With all weights packed channelwise int4, the whole chain becomes
    one pallas_call (kernels/pallas_mlp.py): the [M, F] hidden tensor
    never round-trips HBM and all three contractions run on the int8
    MXU when DRQ is on. Default on (measured +15% full decode step on
    gemma2b_lite, docs/ROUND2_NOTES.md); AEQT_MLP_FUSION=0 disables.

    The down weight is re-packed into the kernel's grouped split-half
    layout and stashed in the weights dict under a synthetic negative
    tensor id (so it rides the traced-weights argument, not a baked
    jit constant); the canonical packed form stays for capture mode.
    """
    self._mlp_fusions = {}
    self._mlp_skip = set()
    if os.environ.get('AEQT_MLP_FUSION', '1') != '1':
      return
    from ai_edge_quantizer_tpu.kernels import pallas_mlp, pallas_qmatmul
    bf = int(os.environ.get('AEQT_MLP_BF', '512'))
    # Synthetic fused arrays shared across signatures: with buffer-shared
    # base packing, each signature's source views alias one array, so
    # the concat/grouped repacks key on those identities (per-signature
    # copies held ~0.8 GiB of duplicate HBM on three-signature graphs).
    grouped_cache: dict = {}
    concat_cache: dict = {}
    sig_out_tids = {
        (s.subgraph_index, tid)
        for s in self.graph.signatures for tid in s.outputs.values()
    }
    for sg_idx, sg in enumerate(self.graph.subgraphs):
      cons: dict = {}
      for oi, o in enumerate(sg.ops):
        for t in o.inputs:
          cons.setdefault(t, []).append((oi, o))
      protected = set(sg.outputs) | {
          tid for (si, tid) in sig_out_tids if si == sg_idx}

      def packed_channelwise(tid):
        key = (sg_idx, tid)
        return (key in self._packed_int4_keys
                and key not in self._packed_block_size
                and self._packed_pad_n.get(key) is None)

      def plain_fc(o):
        return (o.opcode == 'FULLY_CONNECTED' and len(o.inputs) > 1
                and (len(o.inputs) < 3 or o.inputs[2] < 0)
                and o.attrs.get('fused_activation', 'NONE') == 'NONE')

      def norm_fused_input(tid):
        # A norm-fused tensor is produced by a SKIPPED RMS_NORM; only the
        # plain packed-FC path re-applies the norm in-kernel, so the MLP
        # megakernel must not consume it.
        return (sg_idx, tid) in self._norm_fusions

      for gu_idx, gu_op in enumerate(sg.ops):
        if not plain_fc(gu_op) or not packed_channelwise(gu_op.inputs[1]):
          continue
        if norm_fused_input(gu_op.inputs[0]):
          continue
        wgu_key = (sg_idx, gu_op.inputs[1])
        wgu = self._weights.get(wgu_key)
        if wgu is None:  # e.g. a down weight already moved to grouped form
          continue
        two_f = int(wgu.shape[0])
        f = two_f // 2
        if f % bf or f // bf < 2:
          continue
        gu_out = gu_op.outputs[0]
        slices = cons.get(gu_out, [])
        if gu_out in protected or len(slices) != 2 or any(
            o.opcode != 'SLICE' for _, o in slices):
          continue
        gate_e = up_e = None
        for oi, o in slices:
          begin = list(o.attrs.get('begin', []))
          if begin and all(b == 0 for b in begin):
            gate_e = (oi, o)
          elif (begin and begin[-1] == f
                and all(b == 0 for b in begin[:-1])):
            up_e = (oi, o)
        if gate_e is None or up_e is None:
          continue
        gate_tid = gate_e[1].outputs[0]
        up_tid = up_e[1].outputs[0]
        if (sg.tensors[gate_tid].shape[-1] != f
            or sg.tensors[up_tid].shape[-1] != f):
          continue
        gcons = cons.get(gate_tid, [])
        if (len(gcons) != 1 or gcons[0][1].opcode != 'GELU'
            or not bool(gcons[0][1].attrs.get('approximate', True))):
          continue
        gelu_idx, gelu_op = gcons[0]
        gact_tid = gelu_op.outputs[0]
        mcons = cons.get(gact_tid, [])
        if len(mcons) != 1 or mcons[0][1].opcode != 'MUL':
          continue
        mul_idx, mul_op = mcons[0]
        if (set(mul_op.inputs) != {gact_tid, up_tid}
            or len(cons.get(up_tid, [])) != 1):
          continue
        prod_tid = mul_op.outputs[0]
        pcons = cons.get(prod_tid, [])
        if len(pcons) != 1 or not plain_fc(pcons[0][1]):
          continue
        down_idx, down_op = pcons[0]
        if (down_op.inputs[0] != prod_tid
            or not packed_channelwise(down_op.inputs[1])):
          continue
        wd_key = (sg_idx, down_op.inputs[1])
        grouped_tid = -1000 - down_op.inputs[1]
        grouped_key = (sg_idx, grouped_tid)
        wd_packed = self._weights.get(wd_key)
        if wd_packed is None and grouped_key not in self._weights:
          continue
        if wd_packed is not None and int(wd_packed.shape[1]) * 2 != f:
          continue
        if any(t in protected for t in
               (gate_tid, up_tid, gact_tid, prod_tid)):
          continue
        if grouped_key not in self._weights:
          # The grouped layout REPLACES the canonical packed form (no
          # duplicate HBM copy); capture mode rebuilds the canonical
          # view on the fly in _run_signature.
          gk = (id(wd_packed), bf)
          if gk not in grouped_cache:
            grouped_cache[gk] = pallas_mlp.pack_int4_split_grouped(
                pallas_qmatmul.unpack_int4_split(wd_packed), bf)
          self._weights[grouped_key] = grouped_cache[gk]
          del self._weights[wd_key]
        self._mlp_fusions[(sg_idx, gu_idx)] = {
            'x': gu_op.inputs[0],
            'wgu_key': wgu_key,
            'wd_key': wd_key,
            'wd_grouped_tid': grouped_tid,
            'out': down_op.outputs[0],
            'bf': bf,
            'act': 'gelu',
        }
        for oi in (gate_e[0], up_e[0], gelu_idx, mul_idx, down_idx):
          self._mlp_skip.add((sg_idx, oi))

      # Pattern B: separate gate / up projections on the same input.
      prods: dict = {}
      for oi, o in enumerate(sg.ops):
        for t in o.outputs:
          prods[t] = (oi, o)
      for gelu_idx, gelu_op in enumerate(sg.ops):
        if (sg_idx, gelu_idx) in self._mlp_skip:
          continue
        if (gelu_op.opcode != 'GELU'
            or not bool(gelu_op.attrs.get('approximate', True))):
          continue
        gate_tid = gelu_op.inputs[0]
        ge = prods.get(gate_tid)
        if (ge is None or not plain_fc(ge[1])
            or not packed_channelwise(ge[1].inputs[1])
            or len(cons.get(gate_tid, [])) != 1):
          continue
        gate_idx, gate_op = ge
        if norm_fused_input(gate_op.inputs[0]):
          continue
        gact_tid = gelu_op.outputs[0]
        mcons = cons.get(gact_tid, [])
        if len(mcons) != 1 or mcons[0][1].opcode != 'MUL':
          continue
        mul_idx, mul_op = mcons[0]
        others = [t for t in mul_op.inputs if t != gact_tid]
        if len(others) != 1:
          continue
        up_tid = others[0]
        ue = prods.get(up_tid)
        if (ue is None or not plain_fc(ue[1])
            or not packed_channelwise(ue[1].inputs[1])
            or ue[1].inputs[0] != gate_op.inputs[0]
            or len(cons.get(up_tid, [])) != 1):
          continue
        up_idx, up_op = ue
        f = sg.tensors[gate_tid].shape[-1]
        if (sg.tensors[up_tid].shape[-1] != f or f % bf or f // bf < 2):
          continue
        prod_tid = mul_op.outputs[0]
        pcons = cons.get(prod_tid, [])
        if len(pcons) != 1 or not plain_fc(pcons[0][1]):
          continue
        down_idx, down_op = pcons[0]
        if (down_op.inputs[0] != prod_tid
            or not packed_channelwise(down_op.inputs[1])):
          continue
        if any(t in protected for t in
               (gate_tid, up_tid, gact_tid, prod_tid)):
          continue
        gw_key = (sg_idx, gate_op.inputs[1])
        uw_key = (sg_idx, up_op.inputs[1])
        if gw_key == uw_key:  # shared gate/up weight: concat would alias
          continue
        wd_key = (sg_idx, down_op.inputs[1])
        synth_tid = -2000 - gate_op.inputs[1]
        synth_key = (sg_idx, synth_tid)
        grouped_tid = -1000 - down_op.inputs[1]
        grouped_key = (sg_idx, grouped_tid)
        gw, uw = self._weights.get(gw_key), self._weights.get(uw_key)
        if gw is None or uw is None:
          if synth_key not in self._weights:
            continue
        else:
          if gw.shape != uw.shape or int(gw.shape[0]) != f:
            continue
        wd_packed = self._weights.get(wd_key)
        if wd_packed is None and grouped_key not in self._weights:
          continue
        if wd_packed is not None and int(wd_packed.shape[1]) * 2 != f:
          continue
        if synth_key not in self._weights:
          # Row-concat [gate; up] of the canonical packed forms IS the
          # canonical packed gate_up layout the kernel expects; the two
          # originals are dropped (capture mode re-slices the concat).
          ck = (id(gw), id(uw))
          if ck not in concat_cache:
            concat_cache[ck] = (
                jnp.concatenate([gw, uw], axis=0),
                jnp.concatenate([self._packed_scale[gw_key],
                                 self._packed_scale[uw_key]]))
          self._weights[synth_key], self._packed_scale[synth_key] = (
              concat_cache[ck])
          del self._weights[gw_key]
          del self._weights[uw_key]
        if grouped_key not in self._weights:
          gk = (id(wd_packed), bf)
          if gk not in grouped_cache:
            grouped_cache[gk] = pallas_mlp.pack_int4_split_grouped(
                pallas_qmatmul.unpack_int4_split(wd_packed), bf)
          self._weights[grouped_key] = grouped_cache[gk]
          del self._weights[wd_key]
        first_idx = min(gate_idx, up_idx)
        self._mlp_fusions[(sg_idx, first_idx)] = {
            'x': gate_op.inputs[0],
            'wgu_key': synth_key,
            'wgu_split': (gw_key[1], uw_key[1], f),
            'wd_key': wd_key,
            'wd_grouped_tid': grouped_tid,
            'out': down_op.outputs[0],
            'bf': bf,
            'act': 'gelu',
        }
        for oi in (gate_idx, up_idx, gelu_idx, mul_idx, down_idx):
          if oi != first_idx:
            self._mlp_skip.add((sg_idx, oi))

  def _find_head_fusions(self) -> None:
    """Fuse FC(logits) -> ARG_MAX into one vocab-tiled Pallas kernel.

    Greedy decode reduces the [B, vocab] logits to [B] token ids; fusing
    the argmax into the matmul keeps every logits tile in VMEM (131 MB
    of HBM round trip at B=256 over a 256k vocab disappears). Matches a
    plain FULLY_CONNECTED whose weight is channelwise packed int4 or
    symmetric per-channel int8, consumed ONLY by ARG_MAX over the last
    axis. AEQT_HEAD_FUSION=0 disables.
    """
    self._head_fusions = {}
    self._head_skip = set()
    if os.environ.get('AEQT_HEAD_FUSION', '1') != '1':
      return
    sig_out_tids = {
        (s.subgraph_index, tid)
        for s in self.graph.signatures for tid in s.outputs.values()
    }
    for sg_idx, sg in enumerate(self.graph.subgraphs):
      cons: dict = {}
      for oi, o in enumerate(sg.ops):
        for t in o.inputs:
          cons.setdefault(t, []).append((oi, o))
      protected = set(sg.outputs) | {
          tid for (si, tid) in sig_out_tids if si == sg_idx}
      for fc_idx, fc_op in enumerate(sg.ops):
        if (fc_op.opcode != 'FULLY_CONNECTED' or len(fc_op.inputs) < 2
            or fc_op.inputs[1] < 0
            or (len(fc_op.inputs) > 2 and fc_op.inputs[2] >= 0)
            or fc_op.attrs.get('fused_activation', 'NONE') != 'NONE'):
          continue
        if (sg_idx, fc_op.inputs[0]) in self._norm_fusions:
          continue  # only the plain FC kernel re-applies a skipped norm
        out_tid = fc_op.outputs[0]
        if out_tid in protected:
          continue
        consumers = cons.get(out_tid, [])
        if len(consumers) != 1 or consumers[0][1].opcode != 'ARG_MAX':
          continue
        am_idx, am_op = consumers[0]
        rank = len(sg.tensors[out_tid].shape)
        axis = int(am_op.attrs.get('axis', -1))
        if axis not in (-1, rank - 1):
          continue
        w_tid = fc_op.inputs[1]
        key = (sg_idx, w_tid)
        if key in self._packed_int4_keys:
          if key in self._packed_block_size:
            continue
          info = {'packed': True, 'true_n': self._packed_pad_n.get(key)}
        else:
          w_t = sg.tensors[w_tid]
          q = w_t.quantization
          if (w_t.dtype != 'int8' or q is None or q.block_size
              or not np.all(np.asarray(q.zero_point) == 0)
              or np.asarray(q.scale).size != sg.tensors[w_tid].shape[0]):
            continue
          info = {'packed': False, 'true_n': None,
                  'scale': jnp.asarray(q.scale, jnp.float32).reshape(-1)}
        info.update(x=fc_op.inputs[0], w_tid=w_tid,
                    out=am_op.outputs[0])
        self._head_fusions[(sg_idx, fc_idx)] = info
        self._head_skip.add((sg_idx, am_idx))

  def _find_qkv_fusions(self) -> None:
    """Fuse the decode-layer prologue into one pallas_call.

    Matches RMS_NORM -> FC(packed-int4 fused QKV) -> SLICE x3 ->
    {q: RESHAPE->ROPE->TRANSPOSE->RESHAPE, k: RESHAPE->ROPE->TRANSPOSE,
    v: RESHAPE->TRANSPOSE} (decode shape, T=1) and replaces the chain
    with kernels/pallas_qkv.qkv_rope_pallas — the norm output, the
    [B, QKV_N] projection, and the pre-rope head views never reach HBM.
    Opt-in via AEQT_ATTN_BLOCK=1 (serving fast path).
    """
    self._qkv_fusions = {}
    self._qkv_skip = set()
    if (os.environ.get('AEQT_ATTN_BLOCK', '0') != '1'
        or os.environ.get('AEQT_ATTN_QKV', '1') != '1'):
      return
    on_tpu = jax.default_backend() == 'tpu'
    sig_out_tids = {
        (s.subgraph_index, tid)
        for s in self.graph.signatures for tid in s.outputs.values()
    }
    for sg_idx, sg in enumerate(self.graph.subgraphs):
      cons: dict = {}
      for oi, o in enumerate(sg.ops):
        for t in o.inputs:
          cons.setdefault(t, []).append((oi, o))
      protected = set(sg.outputs) | {
          tid for (si, tid) in sig_out_tids if si == sg_idx}

      def link(tid, opcode):
        """Single unprotected float consumer of `tid` with `opcode`."""
        users = cons.get(tid, [])
        if (tid in protected or len(users) != 1
            or users[0][1].opcode != opcode
            or sg.tensors[tid].quantization is not None):
          return None
        return users[0]

      for norm_idx, norm in enumerate(sg.ops):
        if norm.opcode != 'RMS_NORM' or len(norm.inputs) < 2:
          continue
        got = link(norm.outputs[0], 'FULLY_CONNECTED')
        if got is None:
          continue
        fc_idx, fc = got
        if (fc.inputs[0] != norm.outputs[0] or len(fc.inputs) < 2
            or fc.inputs[1] < 0
            or (len(fc.inputs) > 2 and fc.inputs[2] >= 0)
            or fc.attrs.get('fused_activation', 'NONE') != 'NONE'):
          continue
        key = (sg_idx, fc.inputs[1])
        if (key not in self._packed_int4_keys
            or key in self._packed_block_size
            or key in self._packed_pad_n):
          continue
        qkv_tid = fc.outputs[0]
        users = cons.get(qkv_tid, [])
        if (qkv_tid in protected or len(users) != 3
            or any(o.opcode != 'SLICE' for _, o in users)):
          continue
        by_begin = sorted(users, key=lambda u: u[1].attrs['begin'][-1])
        (qs_idx, qs), (ks_idx, ks), (vs_idx, vs) = by_begin

        got = link(qs.outputs[0], 'RESHAPE')
        if got is None:
          continue
        qr_idx, qr = got
        new_shape = qr.attrs.get('new_shape')
        if not new_shape or len(new_shape) != 4 or new_shape[1] != 1:
          continue
        _, t_dim, nq, h = new_shape
        got = link(qr.outputs[0], 'ROPE')
        if got is None:
          continue
        qrope_idx, qrope = got
        got = link(qrope.outputs[0], 'TRANSPOSE')
        if got is None or got[1].attrs.get('perm') != [0, 2, 1, 3]:
          continue
        qt_idx, qt_op = got
        got = link(qt_op.outputs[0], 'RESHAPE')
        if got is None:
          continue
        qg_idx, qg = got

        got = link(ks.outputs[0], 'RESHAPE')
        if got is None:
          continue
        kr_idx, kr = got
        got = link(kr.outputs[0], 'ROPE')
        if got is None:
          continue
        krope_idx, krope = got
        if (krope.inputs[1] != qrope.inputs[1]
            or krope.attrs.get('rope_base') != qrope.attrs.get('rope_base')):
          continue
        got = link(krope.outputs[0], 'TRANSPOSE')
        if got is None or got[1].attrs.get('perm') != [0, 2, 1, 3]:
          continue
        kt_idx, kt_op = got

        got = link(vs.outputs[0], 'RESHAPE')
        if got is None:
          continue
        vr_idx, vr = got
        got = link(vr.outputs[0], 'TRANSPOSE')
        if got is None or got[1].attrs.get('perm') != [0, 2, 1, 3]:
          continue
        vt_idx, vt_op = got

        w_t = sg.tensors[fc.inputs[1]]
        d = int(w_t.shape[-1])  # true K (packed stores bytes = K/2)
        qkv_n = int(w_t.shape[0])
        if qkv_n * h == 0 or qkv_n % h:
          continue
        nk = (qkv_n // h - nq) // 2
        if nk < 1 or (nq + 2 * nk) * h != qkv_n:
          continue
        # Mosaic legality at serving shapes: lane-aligned head halves and
        # packed byte columns (toy shapes run via interpret off-TPU).
        if on_tpu and ((h // 2) % 128 or (d // 2) % 128 or h % 256):
          continue
        self._qkv_fusions[(sg_idx, norm_idx)] = {
            'x': norm.inputs[0], 'gamma': norm.inputs[1],
            'w_tid': fc.inputs[1], 'positions': qrope.inputs[1],
            'rope_base': float(qrope.attrs.get('rope_base', 10000.0)),
            'eps': float(norm.attrs.get('epsilon', 1e-6)),
            'nq': nq, 'nk': nk, 'h': h,
            'q_out': qg.outputs[0], 'k_out': kt_op.outputs[0],
            'v_out': vt_op.outputs[0],
        }
        for oi in (fc_idx, qs_idx, ks_idx, vs_idx, qr_idx, qrope_idx,
                   qt_idx, qg_idx, kr_idx, krope_idx, kt_idx, vr_idx,
                   vt_idx):
          self._qkv_skip.add((sg_idx, oi))

  def _find_attn_epilogues(self) -> None:
    """Extend matched attention fusions with an out-proj + residual tail.

    ctx -> RESHAPE -> TRANSPOSE -> RESHAPE -> FC(packed int4) ->
    ADD(residual) collapses into the attention kernel's epilogue
    (kernels/pallas_attention.decode_attention_oproj_pallas): the
    [B, G*H] ctx and the projection output never reach HBM. Requires
    MQA (NK == 1) and prefix-form masks; opt-in via AEQT_ATTN_BLOCK=1.
    """
    if (os.environ.get('AEQT_ATTN_BLOCK', '0') != '1'
        or os.environ.get('AEQT_ATTN_OPROJ', '1') != '1'):
      return
    on_tpu = jax.default_backend() == 'tpu'
    sig_out_tids = {
        (s.subgraph_index, tid)
        for s in self.graph.signatures for tid in s.outputs.values()
    }
    for (sg_idx, bmm2_idx), fusion in list(self._attn_fusions.items()):
      if 'epilogue' in fusion:
        continue
      sg = self.graph.subgraphs[sg_idx]
      cons: dict = {}
      for oi, o in enumerate(sg.ops):
        for t in o.inputs:
          cons.setdefault(t, []).append((oi, o))
      protected = set(sg.outputs) | {
          tid for (si, tid) in sig_out_tids if si == sg_idx}

      def link(tid, opcode):
        users = cons.get(tid, [])
        if (tid in protected or len(users) != 1
            or users[0][1].opcode != opcode
            or sg.tensors[tid].quantization is not None):
          return None
        return users[0]

      q_shape = sg.tensors[fusion['q']].shape
      if len(q_shape) != 4 or q_shape[1] != 1:
        continue  # MQA only (NK == 1)
      # VMEM feasibility at the smallest sublane-legal batch block
      # (bb = min(8, B)): the kernel raises at trace time when no legal
      # block fits its budget, and this path is unconditional once
      # matched — so refuse the match instead.
      b_dim, _, g_dim, h_dim = q_shape
      s_dim = sg.tensors[fusion['k']].shape[2]
      bb_min = min(8, b_dim)
      if 2 * (2 * bb_min * s_dim * h_dim) > 13 * 2**20:
        continue
      g, h = int(q_shape[2]), int(q_shape[3])
      if g % 2:
        continue
      got = link(fusion['out'], 'RESHAPE')
      if got is None:
        continue
      r1_idx, r1 = got
      got = link(r1.outputs[0], 'TRANSPOSE')
      if got is None or got[1].attrs.get('perm') != [0, 2, 1, 3]:
        continue
      t_idx, t_op = got
      got = link(t_op.outputs[0], 'RESHAPE')
      if got is None:
        continue
      r2_idx, r2 = got
      got = link(r2.outputs[0], 'FULLY_CONNECTED')
      if got is None:
        continue
      fc_idx, fc = got
      if (fc.inputs[0] != r2.outputs[0] or len(fc.inputs) < 2
          or fc.inputs[1] < 0
          or (len(fc.inputs) > 2 and fc.inputs[2] >= 0)
          or fc.attrs.get('fused_activation', 'NONE') != 'NONE'):
        continue
      key = (sg_idx, fc.inputs[1])
      if (key not in self._packed_int4_keys
          or key in self._packed_block_size
          or key in self._packed_pad_n):
        continue
      got = link(fc.outputs[0], 'ADD')
      if got is None:
        continue
      add_idx, add = got
      others = [t for t in add.inputs if t != fc.outputs[0]]
      if len(others) != 1:
        continue
      x_res = others[0]
      d = int(sg.tensors[fc.inputs[1]].shape[0])
      s_len = int(sg.tensors[fusion['k']].shape[2])
      if on_tpu and (h % 128 or (d % 128) or ((g * h) // 2) % 128
                     or s_len % 128):
        continue
      fusion['epilogue'] = {
          'wo_tid': fc.inputs[1], 'x_res': x_res, 'y': add.outputs[0],
          'd': d,
      }
      for oi in (r1_idx, t_idx, r2_idx, fc_idx, add_idx):
        self._attn_skip.add((sg_idx, oi))

  # -- public API -----------------------------------------------------------

  def signature_runner(self, signature_key: str = 'serving_default',
                       capture_all: bool = False,
                       serving_fastpaths: bool = False):
    """A callable(inputs: dict) -> dict of outputs (or all tensors).

    capture_all works with packed serving weights: packed int4 FC weights
    are returned as their unpacked true-shape int8 view, so the dual-model
    validator can assert per-tensor error bounds on the exact production
    configuration. serving_fastpaths additionally keeps the fused
    attention / norm-fusion kernels engaged under capture (their internal
    intermediates are simply absent from the capture dict)."""
    key = (signature_key, capture_all, serving_fastpaths)
    if key not in self._jit_cache:
      sig = self.graph.signature_by_key(signature_key)
      fn = functools.partial(
          self._run_signature, sig.subgraph_index, signature_key, capture_all,
          serving_fastpaths=serving_fastpaths)
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

  def stats_runner(self, signature_key: str = 'serving_default',
                   hessian_tensor_names=()):
    """On-device calibration statistics: callable(inputs) -> {name: qsv}.

    The TPU answer to the reference's profiler-based calibrator
    (`_pywrap_tfl_calibration`, ref calibrator.py:590-686): min/max (and,
    for names in `hessian_tensor_names`, the GPTQ Hessian 2/n * XᵀX) are
    reduced INSIDE the jitted forward program, so only scalars/small
    matrices cross the device->host link instead of every intermediate
    tensor. Orders of magnitude less transfer than `capture_all` on large
    calibration batches.
    """
    hessians = tuple(sorted(hessian_tensor_names))
    key = (signature_key, 'stats', hessians)
    if key not in self._jit_cache:
      sig = self.graph.signature_by_key(signature_key)
      fn = functools.partial(self._run_signature_stats, sig.subgraph_index,
                             signature_key, hessians)
      self._jit_cache[key] = jax.jit(fn)
    jitted = self._jit_cache[key]

    def runner(inputs: dict):
      return jax.device_get(jitted(self._weights, inputs))

    runner.jitted = jitted
    return runner

  def _run_signature_stats(self, sg_idx: int, signature_key: str,
                           hessian_names: tuple, weights: dict,
                           inputs: dict):
    # Valid-range mask mirrors host-side calibration (min_max.py): values
    # outside +-3e38 (inf/overflow) are excluded unless nothing survives.
    lo, hi = -3e38, 3e38
    all_tensors = self._run_signature(sg_idx, signature_key, True, weights,
                                      inputs)
    sg = self.graph.subgraphs[sg_idx]
    const_names = {
        t.name for t in sg.tensors
        if t.buffer >= 0 and self.graph.buffers[t.buffer].data is not None
    }
    stats = {}
    for name, v in all_tensors.items():
      if name in const_names or not jnp.issubdtype(v.dtype, jnp.floating):
        continue
      v32 = v.astype(jnp.float32)
      mask = (v32 > lo) & (v32 < hi)
      any_valid = jnp.any(mask)
      vmin = jnp.where(any_valid,
                       jnp.min(jnp.where(mask, v32, jnp.inf)), jnp.min(v32))
      vmax = jnp.where(any_valid,
                       jnp.max(jnp.where(mask, v32, -jnp.inf)), jnp.max(v32))
      shape1 = (1,) * v.ndim
      entry = {'min': vmin.reshape(shape1), 'max': vmax.reshape(shape1)}
      if name in hessian_names:
        x = v32.reshape(-1, v32.shape[-1])
        n = v.shape[0]  # leading dim = sample count (gptq.calibrate parity)
        entry['hessian'] = (2.0 / n) * (x.T @ x)
        entry['num_samples'] = jnp.asarray(n, jnp.int32)
      stats[name] = entry
    return stats

  # -- evaluation -----------------------------------------------------------

  def _run_signature(self, sg_idx: int, signature_key: str,
                     capture_all: bool, weights: dict, inputs: dict,
                     serving_fastpaths: bool = False):
    sig = self.graph.signature_by_key(signature_key)
    sg = self.graph.subgraphs[sg_idx]
    env: dict = {}
    for (w_sg, w_tid), arr in weights.items():
      if w_sg == sg_idx:
        env[w_tid] = arr
    if capture_all:
      # MLP-fused down weights live only in the grouped kernel layout;
      # rebuild the canonical packed view so the unrolled chain and the
      # validator's per-tensor capture still see the weight.
      from ai_edge_quantizer_tpu.kernels import pallas_mlp, pallas_qmatmul
      for (f_sg, _), info in self._mlp_fusions.items():
        if f_sg != sg_idx:
          continue
        wd_tid = info['wd_key'][1]
        if wd_tid not in env:
          env[wd_tid] = pallas_qmatmul.pack_int4_split(
              pallas_mlp.unpack_int4_split_grouped(
                  env[info['wd_grouped_tid']], info['bf']))
        split = info.get('wgu_split')
        if split is not None:
          g_tid, u_tid, f = split
          synth = env[info['wgu_key'][1]]
          if g_tid not in env:
            env[g_tid] = synth[:f]
          if u_tid not in env:
            env[u_tid] = synth[f:]
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

    for op_idx, op in enumerate(sg.ops):
      # capture_all keeps every intermediate visible (fusions unrolled)
      # unless serving_fastpaths pins the production kernels.
      if not capture_all or serving_fastpaths:
        block = self._block_fusions.get((sg_idx, op_idx))
        if block is not None:
          self._eval_fused_block(sg_idx, sg, block, env)
          continue
        if (sg_idx, op_idx) in self._block_skip:
          continue
        fusion = self._attn_fusions.get((sg_idx, op_idx))
        if fusion is not None:
          self._eval_fused_attention(sg_idx, sg, fusion, env)
          continue
        mlp = self._mlp_fusions.get((sg_idx, op_idx))
        if mlp is not None:
          self._eval_fused_mlp(sg_idx, sg, mlp, env)
          continue
        head = self._head_fusions.get((sg_idx, op_idx))
        if head is not None:
          self._eval_fused_head(sg_idx, sg, head, env)
          continue
        qkv = self._qkv_fusions.get((sg_idx, op_idx))
        if qkv is not None:
          self._eval_fused_qkv(sg_idx, sg, qkv, env)
          continue
        moe = self._moe_fusions.get((sg_idx, op_idx))
        if moe is not None:
          self._eval_fused_moe(sg_idx, sg, moe, env)
          continue
        if (sg_idx, op_idx) in self._moe_skip:
          continue
        if (sg_idx, op_idx) in self._attn_skip:
          continue
        if (sg_idx, op_idx) in self._mlp_skip:
          continue  # folded into the MLP megakernel
        if (sg_idx, op_idx) in self._head_skip:
          continue  # ARG_MAX folded into the head kernel
        if (sg_idx, op_idx) in self._qkv_skip:
          continue  # folded into the qkv-rope prologue kernel
        if (sg_idx, op_idx) in self._norm_skip:
          continue  # folded into the consuming packed-FC kernels
      self._eval_op(sg_idx, sg, op, env)

    if capture_all:
      out = {}
      for tid, t in enumerate(sg.tensors):
        if tid not in env:
          continue
        val = env[tid]
        key = (sg_idx, tid)
        if key in self._packed_int4_keys:
          # Unpacked true-shape int8 view so packed serving weights stay
          # validator-visible per tensor.
          from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
          val = pallas_qmatmul.unpack_int4_split(val)
          true_n = self._packed_pad_n.get(key)
          if true_n is not None:
            val = val[:true_n]
        out[t.name] = val
      return out
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

    if opcode == 'STABLEHLO_COMPOSITE':
      # Execute the composite's body subgraph inline: op inputs map to the
      # subgraph's inputs positionally, subgraph outputs to op outputs.
      if not op.side_effect_subgraphs:
        raise NotImplementedError(
            'STABLEHLO_COMPOSITE without a body subgraph.')
      body = self.graph.subgraphs[op.side_effect_subgraphs[0]]
      body_idx = op.side_effect_subgraphs[0]
      body_env: dict = {}
      for (w_sg, w_tid), arr in self._weights.items():
        if w_sg == body_idx:
          body_env[w_tid] = arr
      for body_tid, outer_tid in zip(body.inputs, op.inputs):
        body_env[body_tid] = env[outer_tid]
      for body_op in body.ops:
        self._eval_op(body_idx, body, body_op, body_env)
      results = tuple(body_env[t] for t in body.outputs)
      self._store_outputs(sg, op, results, env)
      return

    if opcode == 'WHILE':
      # TFLite WHILE: loop-carried op inputs; cond subgraph -> scalar bool,
      # body subgraph -> same-arity carry. Lowers to lax.while_loop (traced
      # once — the XLA-native control flow the reference's interpreter
      # re-dispatches per iteration).
      cond_idx, body_idx = op.side_effect_subgraphs

      def subgraph_fn(sub_idx):
        sub = self.graph.subgraphs[sub_idx]

        def fn(carry):
          sub_env: dict = {}
          for (w_sg, w_tid), arr in self._weights.items():
            if w_sg == sub_idx:
              sub_env[w_tid] = arr
          for sub_tid, val in zip(sub.inputs, carry):
            sub_env[sub_tid] = val
          for sub_op in sub.ops:
            self._eval_op(sub_idx, sub, sub_op, sub_env)
          return tuple(sub_env[t] for t in sub.outputs)

        return fn

      cond_fn = subgraph_fn(cond_idx)
      body_fn = subgraph_fn(body_idx)
      carry = tuple(env[t] for t in op.inputs)
      out = jax.lax.while_loop(
          lambda c: jnp.reshape(cond_fn(c)[0], ()), body_fn, carry)
      self._store_outputs(sg, op, out, env)
      return

    if opcode == 'IF':
      then_idx, else_idx = op.side_effect_subgraphs
      pred = jnp.reshape(env[op.inputs[0]], ())
      operands = tuple(env[t] for t in op.inputs[1:])

      def branch(sub_idx):
        sub = self.graph.subgraphs[sub_idx]

        def fn(args):
          sub_env: dict = {}
          for (w_sg, w_tid), arr in self._weights.items():
            if w_sg == sub_idx:
              sub_env[w_tid] = arr
          for sub_tid, val in zip(sub.inputs, args):
            sub_env[sub_tid] = val
          for sub_op in sub.ops:
            self._eval_op(sub_idx, sub, sub_op, sub_env)
          return tuple(sub_env[t] for t in sub.outputs)

        return fn

      out = jax.lax.cond(pred, branch(then_idx), branch(else_idx), operands)
      self._store_outputs(sg, op, out, env)
      return

    if (
        self.use_fused_kernels
        and opcode == 'DYNAMIC_UPDATE_SLICE'
        and len(op.inputs) >= 3
        and self._same_int_params(sg, op.inputs[0], op.inputs[1],
                                  op.outputs[0])
    ):
      # int8 cache update: splice integers directly — no dequant/requant
      # round trip over the whole cache.
      operand = env[op.inputs[0]]
      skip_mode = os.environ.get('AEQT_SKIP_CACHE_WRITE', '0')
      if skip_mode == 'v_only':
        # Diagnostic: skip only v-cache writes (half the DUS dispatches)
        # to separate per-dispatch cost from whole-structure effects.
        name = sg.tensors[op.outputs[0]].name
        skip_mode = '1' if '/v_cache' in name or 'v_cache' in name else '0'
      if skip_mode == '1':
        # PERF DIAGNOSTIC ONLY (wrong numerics): bound the cost of the
        # per-layer cache DUS dispatches by aliasing output to input.
        if not getattr(self, '_warned_skip_cache_write', False):
          self._warned_skip_cache_write = True
          logging.warning(
              'AEQT_SKIP_CACHE_WRITE=1: KV-cache writes are DISABLED — '
              'decode outputs are numerically WRONG (perf diagnostic).')
        if os.environ.get('AEQT_SKIP_CACHE_BARRIER', '0') == '1':
          # Variant: no write, but the cache still looks data-dependent,
          # so it cannot leave a surrounding scan's loop carry. Isolates
          # "cost of the write" from "cost of carry residency".
          operand = jax.lax.optimization_barrier(operand)
        env[op.outputs[0]] = operand
        return
      update = env[op.inputs[1]].astype(operand.dtype)
      starts = env[op.inputs[2]]
      from ai_edge_quantizer_tpu.kernels import pallas_cache
      if (
          os.environ.get('AEQT_CACHE_WRITE_PALLAS', '0') == '1'
          and jax.default_backend() == 'tpu'
          and getattr(update, 'ndim', 0) == operand.ndim
          and pallas_cache.supports(
              operand.shape, update.shape, operand.dtype)
          and self._sole_consumer(sg, op.inputs[0], op)
      ):
        # Row-tile RMW DMA instead of XLA's DUS lowering, which cost
        # ~42 us x 36 updates = 1.5 ms/step at the bench shape
        # (AEQT_SKIP_CACHE_WRITE A/B, docs/ROUND2_NOTES.md).
        # Sole-consumer guard: aliasing donates the operand, so no other
        # op may read the pre-update value (XLA would insert a full-cache
        # copy to satisfy the alias, erasing the win).
        env[op.outputs[0]] = pallas_cache.dus_row_inplace_pallas(
            operand, update, starts)
        return
      out = jax.lax.dynamic_update_slice(
          operand, update,
          tuple(starts[i].astype(jnp.int32) for i in range(operand.ndim)))
      env[op.outputs[0]] = out
      return

    if (
        self.use_fused_kernels
        and opcode in ('CONV_2D', 'DEPTHWISE_CONV_2D')
        and os.environ.get('AEQT_SRQ_INT', '1') == '1'
        and self._try_srq_int_conv(sg, op, env)
    ):
      return

    if (
        self.use_fused_kernels
        and opcode == 'BATCH_MATMUL'
        and os.environ.get('AEQT_SRQ_INT', '1') == '1'
        and self._try_srq_int_bmm(sg, op, env)
    ):
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

  def _try_srq_int_bmm(self, sg: ir.Subgraph, op: ir.Op,
                       env: dict) -> bool:
    """Integer SRQ batched matmul (SRQ attention score/context matmuls).

    Both operands are int8 ACTIVATIONS with per-tensor params; the zero
    points expand in closed form through runtime row/column sums:

      (A - za)(B - zb) = AB - za*colsum(B) - zb*rowsum(A) + K*za*zb

    so the big contraction stays int8 x int8 -> int32 on the MXU."""
    a_tid, b_tid = op.inputs[0], op.inputs[1]
    if a_tid < 0 or b_tid < 0:
      return False
    a_t, b_t = sg.tensors[a_tid], sg.tensors[b_tid]
    aq, bq = a_t.quantization, b_t.quantization
    a, b = env.get(a_tid), env.get(b_tid)
    if (
        aq is None or bq is None or a is None or b is None
        or getattr(a, 'dtype', None) != jnp.int8
        or getattr(b, 'dtype', None) != jnp.int8
        or np.asarray(aq.scale).size != 1 or np.asarray(bq.scale).size != 1
    ):
      return False
    if op.attrs.get('adj_x', False):
      a = jnp.swapaxes(a, -1, -2)
    if op.attrs.get('adj_y', False):
      b = jnp.swapaxes(b, -1, -2)
    k = a.shape[-1]
    za = int(np.asarray(aq.zero_point).reshape(()))
    zb = int(np.asarray(bq.zero_point).reshape(()))
    acc = jnp.matmul(a, b, preferred_element_type=jnp.int32)
    if zb:
      acc = acc - zb * jnp.sum(a.astype(jnp.int32), axis=-1, keepdims=True)
    if za:
      acc = acc - za * jnp.sum(b.astype(jnp.int32), axis=-2, keepdims=True)
    if za and zb:
      acc = acc + jnp.int32(k * za * zb)
    y = acc.astype(jnp.float32) * (
        float(np.asarray(aq.scale).reshape(()))
        * float(np.asarray(bq.scale).reshape(())))
    self._store_outputs(sg, op, (y,), env)
    return True

  def _try_srq_int_conv(self, sg: ir.Subgraph, op: ir.Op,
                        env: dict) -> bool:
    """Integer SRQ convolution: int8 x int8 -> int32 on the MXU.

    SAME padding pads with the ACTIVATION ZERO POINT (TFLite integer-conv
    semantics: padded pixels dequantize to 0.0, matching the float
    model's zero padding), so every output window sums the full weight
    stencil and the zero-point correction is the constant
    zp_x * sum(w) per output channel. y = (acc - zp*wsum) * s_x * s_w.
    8x the f32 MXU rate of the dequantize-first generic path — the
    MobileNet/encoder-class SRQ serving fast path. Returns False when
    the op doesn't fit (the generic path then runs)."""
    x_tid, w_tid = op.inputs[0], op.inputs[1]
    if x_tid < 0 or w_tid < 0:
      return False
    x_t, w_t = sg.tensors[x_tid], sg.tensors[w_tid]
    xq, wq_info = x_t.quantization, w_t.quantization
    x_val, w_val = env.get(x_tid), env.get(w_tid)
    if (
        xq is None or wq_info is None
        or x_val is None or w_val is None
        or getattr(x_val, 'dtype', None) != jnp.int8
        or getattr(w_val, 'dtype', None) != jnp.int8
        or np.asarray(xq.scale).size != 1
        or not np.all(np.asarray(wq_info.zero_point) == 0)
        or wq_info.block_size
    ):
      return False
    s = int(op.attrs.get('stride', 1))
    padding = op.attrs.get('padding', 'SAME')
    if not isinstance(padding, str):
      return False
    zp = int(np.asarray(xq.zero_point).reshape(()))
    depthwise = op.opcode == 'DEPTHWISE_CONV_2D'
    if depthwise:
      ch = w_val.shape[-1]
      if int(w_val.shape[0]) != 1 or ch != int(x_val.shape[-1]):
        return False  # channel multiplier > 1: generic path
      w_conv = jnp.transpose(w_val, (3, 1, 2, 0))  # [ch, kh, kw, 1]
      groups = ch
      w_sums = jnp.sum(w_val.astype(jnp.int32), axis=(0, 1, 2))  # [ch]
    else:
      w_conv = w_val  # [out_c, kh, kw, in_c]
      groups = 1
      w_sums = jnp.sum(w_val.astype(jnp.int32), axis=(1, 2, 3))  # [out_c]
    kh, kw = int(w_conv.shape[1]), int(w_conv.shape[2])
    pads = jax.lax.padtype_to_pads(
        x_val.shape[1:3], (kh, kw), (s, s), padding)
    if zp != 0 and any(p != (0, 0) for p in pads):
      x_padded = jnp.pad(
          x_val, ((0, 0), pads[0], pads[1], (0, 0)),
          constant_values=np.int8(zp))
      conv_pads = 'VALID'
    else:
      x_padded = x_val
      conv_pads = list(pads)
    acc = jax.lax.conv_general_dilated(
        x_padded, w_conv, window_strides=(s, s), padding=conv_pads,
        dimension_numbers=('NHWC', 'OHWI', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    acc = acc - jnp.int32(zp) * w_sums[None, None, None, :]
    y = acc.astype(jnp.float32) * (
        float(np.asarray(xq.scale).reshape(()))
        * jnp.asarray(np.asarray(wq_info.scale, np.float32).reshape(-1)))
    b_tid = op.inputs[2] if len(op.inputs) > 2 else -1
    if b_tid >= 0:
      y = y + self._dequant_view(sg, b_tid, env)
    y = ops_impl._fused_activation(
        y, op.attrs.get('fused_activation', 'NONE'))
    self._store_outputs(sg, op, (y,), env)
    return True

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

  def _sole_consumer(self, sg: ir.Subgraph, tid: int, op: ir.Op) -> bool:
    """True if `op` is the only consumer of `tid` (and it's no output)."""
    if tid in sg.outputs:
      return False
    count = 0
    for o in sg.ops:
      count += o.inputs.count(tid)
      if count > 1:
        return False
    return count == 1

  def _same_int_params(self, sg: ir.Subgraph, *tids) -> bool:
    """All tensors int-typed with identical quantization params."""
    infos = []
    for tid in tids:
      if tid < 0:
        return False
      t = sg.tensors[tid]
      if t.quantization is None or not t.dtype.startswith('int'):
        return False
      infos.append(t.quantization)
    first = infos[0]
    return all(
        np.array_equal(np.asarray(q.scale), np.asarray(first.scale))
        and np.array_equal(np.asarray(q.zero_point),
                           np.asarray(first.zero_point))
        and q.num_bits == first.num_bits
        for q in infos[1:]
    )

  def _eval_fused_attention(self, sg_idx: int, sg: ir.Subgraph,
                            fusion: dict, env: dict) -> None:
    """Emit one fused int8-cache attention call for a matched chain."""
    q_val = self._dequant_view(sg, fusion['q'], env)
    mask = self._dequant_view(sg, fusion['mask'], env)
    wb = fusion.get('writeback')
    if wb is not None:
      h_wb = q_val.shape[-1]
      s_wb = sg.tensors[wb['k']['operand']].shape[2]
      wb_mode = os.environ.get('AEQT_ATTN_WRITEBACK_MODE', 'stale')
      wb_common = (
          jax.default_backend() == 'tpu'
          and os.environ.get('AEQT_ATTN_LENGTHS', '0') == '1'
          and fusion.get('epilogue') is None
          and q_val.shape[2] < 32  # decode-shaped only
          and h_wb % 128 == 0
      )
      if wb_common and wb_mode == 'stale' and s_wb % 128 == 0:
        # Stale-cache mode: attention reads the PRE-WRITE cache plus the
        # new row as an inline softmax column (exact numerics), and the
        # cache DUS runs OFF the attention critical path — writes gating
        # the attention's cache DMA cost ~64 us/layer (v-only skip A/B:
        # 1.15 ms/step for half the writes).
        from ai_edge_quantizer_tpu.kernels import pallas_attention
        k_info = sg.tensors[fusion['k']].quantization
        v_info = sg.tensors[fusion['v']].quantization
        lengths = jnp.sum(
            (mask[:, 0, 0, :] > -1e8).astype(jnp.int32), axis=-1)
        ctx = pallas_attention.decode_attention_int8_lengths_stale(
            q_val, env[wb['k']['operand']], env[wb['v']['operand']],
            float(np.asarray(k_info.scale).reshape(())) *
            fusion['k_scale_factor'],
            float(np.asarray(v_info.scale).reshape(())),
            lengths,
            env[wb['k']['update']].astype(jnp.int8),
            env[wb['v']['update']].astype(jnp.int8),
            k_zero_point=float(np.asarray(k_info.zero_point).reshape(())),
            v_zero_point=float(np.asarray(v_info.zero_point).reshape(())),
            compute=os.environ.get('AEQT_ATTN_COMPUTE', 'f32'),
            batch_block=int(os.environ.get('AEQT_ATTN_BB', '4')),
            out_dtype=self._act_dtype)
        # The carry write happens in XLA, consumed only by the signature
        # outputs / next step — never by this attention.
        for side in ('k', 'v'):
          info = wb[side]
          operand = env[info['operand']]
          update = env[info['update']].astype(operand.dtype)
          starts = env[info['starts']]
          env[info['out']] = jax.lax.dynamic_update_slice(
              operand, update,
              tuple(starts[i].astype(jnp.int32)
                    for i in range(operand.ndim)))
        out_op = ir.Op(opcode='BATCH_MATMUL', inputs=[],
                       outputs=[fusion['out']])
        self._store_outputs(sg, out_op, (ctx,), env)
        return
      use_wb_kernel = (
          wb_common and wb_mode == 'splice'
          and s_wb % 32 == 0  # int8 row-tile alignment for the writeback
      )
      if use_wb_kernel:
        from ai_edge_quantizer_tpu.kernels import pallas_attention
        k_info = sg.tensors[fusion['k']].quantization
        v_info = sg.tensors[fusion['v']].quantization
        lengths = jnp.sum(
            (mask[:, 0, 0, :] > -1e8).astype(jnp.int32), axis=-1)
        starts = env[wb['k']['starts']]
        ctx, k_new_cache, v_new_cache = (
            pallas_attention.decode_attention_int8_lengths_writeback(
                q_val, env[wb['k']['operand']], env[wb['v']['operand']],
                float(np.asarray(k_info.scale).reshape(())) *
                fusion['k_scale_factor'],
                float(np.asarray(v_info.scale).reshape(())),
                lengths,
                env[wb['k']['update']].astype(jnp.int8),
                env[wb['v']['update']].astype(jnp.int8),
                starts[2].astype(jnp.int32),
                k_zero_point=float(
                    np.asarray(k_info.zero_point).reshape(())),
                v_zero_point=float(
                    np.asarray(v_info.zero_point).reshape(())),
                compute=os.environ.get('AEQT_ATTN_COMPUTE', 'f32'),
                batch_block=int(os.environ.get('AEQT_ATTN_BB', '4')),
                out_dtype=self._act_dtype))
        env[wb['k']['out']] = k_new_cache
        env[wb['v']['out']] = v_new_cache
        out_op = ir.Op(opcode='BATCH_MATMUL', inputs=[],
                       outputs=[fusion['out']])
        self._store_outputs(sg, out_op, (ctx,), env)
        return
      # Fallback (CPU / masked / dynlen / prefill / epilogue modes):
      # materialize the skipped cache DUS in XLA, then proceed unfused.
      for side in ('k', 'v'):
        info = wb[side]
        operand = env[info['operand']]
        update = env[info['update']].astype(operand.dtype)
        starts = env[info['starts']]
        env[info['out']] = jax.lax.dynamic_update_slice(
            operand, update,
            tuple(starts[i].astype(jnp.int32)
                  for i in range(operand.ndim)))
    k_q = env[fusion['k']]
    v_q = env[fusion['v']]
    k_info = sg.tensors[fusion['k']].quantization
    v_info = sg.tensors[fusion['v']].quantization
    k_scale = float(np.asarray(k_info.scale).reshape(())) * \
        fusion['k_scale_factor']
    v_scale = float(np.asarray(v_info.scale).reshape(()))
    zp_k = float(np.asarray(k_info.zero_point).reshape(()))
    zp_v = float(np.asarray(v_info.zero_point).reshape(()))
    ep = fusion.get('epilogue')
    if ep is not None:
      # AEQT_ATTN_BLOCK serving mode: the out-projection + residual ops
      # were skipped at match time, so this path is unconditional. The
      # harness guarantees prefix-form masks (same contract as
      # AEQT_ATTN_LENGTHS); lengths derive from the shared mask tensor
      # (one tiny reduce, CSE'd across layers).
      from ai_edge_quantizer_tpu.kernels import pallas_attention
      lengths = jnp.sum(
          (mask[:, 0, 0, :] > -1e8).astype(jnp.int32), axis=-1)
      x_res = self._dequant_view(sg, ep['x_res'], env)
      wo = env[ep['wo_tid']]
      so = self._packed_scale[(sg_idx, ep['wo_tid'])]
      # Same DRQ gate as the unfused packed-int4 FC fast path so fused
      # and unfused projections agree bit-for-bit.
      drq = (os.environ.get('AEQT_INT4_DRQ', '0') == '1'
             and wo.shape[1] * 2 <= 8192)
      y = pallas_attention.decode_attention_oproj_pallas(
          q_val, k_q, v_q, k_scale, v_scale, lengths, x_res, wo, so,
          k_zero_point=zp_k, v_zero_point=zp_v,
          compute=os.environ.get('AEQT_ATTN_COMPUTE', 'f32'),
          batch_block=int(os.environ.get('AEQT_ATTN_BB', '4')),
          drq=drq, interpret=jax.default_backend() != 'tpu')
      out_op = ir.Op(opcode='ADD', inputs=[], outputs=[ep['y']])
      self._store_outputs(sg, out_op, (y,), env)
      return
    # Mosaic tiling: the head dim must fill full 128-lane tiles and the
    # cache length full sublane tiles; toy-sized heads (e.g. H=32) crash
    # the remote compiler (memref_slice) — keep them on the XLA twin.
    h_dim = q_val.shape[-1]
    s_dim = k_q.shape[2]
    pallas_ok = h_dim % 128 == 0 and s_dim % 128 == 0
    if jax.default_backend() == 'tpu' and pallas_ok:
      from ai_edge_quantizer_tpu.kernels import pallas_attention
      if q_val.shape[2] >= 32:
        # Prefill-shaped (R = G*T rows): flash kernel, S-blocked online
        # softmax — the [R, S] score matrix never hits VMEM whole.
        ctx = pallas_attention.flash_attention_int8_masked(
            q_val, k_q, v_q, k_scale, v_scale, mask,
            k_zero_point=zp_k, v_zero_point=zp_v)
      else:
        if os.environ.get('AEQT_ATTN_LENGTHS', '0') == '1':
          # Prefix-visibility serving mode: the harness guarantees the
          # additive mask is prefix-form (0 up to the live position,
          # -inf after — true for the bench loop and DecodeServer by
          # construction), so per-row lengths replace the mask and the
          # [B, G, S] mask block (~8 MB/layer at B=256 S=1024) never
          # streams into the kernel. The one derivation reduce below is
          # CSE'd across all layers (same mask tensor). Exact twin of
          # the masked kernel for prefix masks.
          lengths = jnp.sum(
              (mask[:, 0, 0, :] > -1e8).astype(jnp.int32), axis=-1)
          ctx = pallas_attention.decode_attention_int8_lengths(
              q_val, k_q, v_q, k_scale, v_scale, lengths,
              k_zero_point=zp_k, v_zero_point=zp_v,
              compute=os.environ.get('AEQT_ATTN_COMPUTE', 'f32'),
              batch_block=int(os.environ.get('AEQT_ATTN_BB', '4')),
              out_dtype=self._act_dtype)
        elif os.environ.get('AEQT_ATTN_DYNLEN', '0') == '1':
          # Dynamic-length cache reads: decode masks are visibility
          # prefixes ([0, pos] visible), so the kernel streams only the
          # live rows — a 256-token conversation reads 1/4 of an S=1024
          # cache. Lengths derive in-graph from the mask (one tiny
          # reduce), preserving the graph's mask semantics.
          lengths = jnp.sum(
              (mask[:, 0, 0, :] > -1e8).astype(jnp.int32), axis=-1)
          ctx = pallas_attention.decode_attention_int8_dynlen(
              q_val, k_q, v_q, k_scale, v_scale, lengths,
              k_zero_point=zp_k, v_zero_point=zp_v)
        else:
          # batch_block=4 measured: 810us vs 1026us (bb=1) isolated at
          # B=256 S=1024, and +15% full-step decode throughput (25.0k vs
          # 21.8k tok/s lite); bb=16 exceeds Mosaic VMEM and fails to
          # compile — keep to <= 8.
          ctx = pallas_attention.decode_attention_int8_masked(
              q_val, k_q, v_q, k_scale, v_scale, mask,
              k_zero_point=zp_k, v_zero_point=zp_v,
              compute=os.environ.get('AEQT_ATTN_COMPUTE', 'f32'),
              batch_block=int(os.environ.get('AEQT_ATTN_BB', '4')))
    else:
      # XLA twin with the same numerics (zp corrections in closed form).
      qf = q_val.astype(jnp.float32)
      scores = jnp.einsum('bngh,bnsh->bngs', qf, k_q.astype(jnp.float32))
      scores = scores - zp_k * jnp.sum(qf, axis=-1, keepdims=True)
      scores = scores * (k_scale / (q_val.shape[-1] ** 0.5))
      scores = scores + mask.astype(jnp.float32)
      probs = jax.nn.softmax(scores, axis=-1)
      ctx = (jnp.einsum('bngs,bnsh->bngh', probs,
                        v_q.astype(jnp.float32)) - zp_v) * v_scale
    out_t = sg.tensors[fusion['out']]
    out_op = ir.Op(opcode='BATCH_MATMUL', inputs=[], outputs=[fusion['out']])
    self._store_outputs(sg, out_op, (ctx,), env)

  def _eval_fused_mlp(self, sg_idx: int, sg: ir.Subgraph,
                      fusion: dict, env: dict) -> None:
    """Emit one MLP megakernel call for a matched GeGLU chain."""
    from ai_edge_quantizer_tpu.kernels import pallas_mlp
    x = self._dequant_view(sg, fusion['x'], env)
    y = pallas_mlp.mlp_pallas_int4_packed(
        x,
        env[fusion['wgu_key'][1]],
        self._packed_scale[fusion['wgu_key']],
        env[fusion['wd_grouped_tid']],
        self._packed_scale[fusion['wd_key']],
        act=fusion['act'],
        drq=os.environ.get('AEQT_INT4_DRQ', '0') == '1',
        bf=fusion['bf'],
        interpret=jax.default_backend() != 'tpu')
    out_op = ir.Op(opcode='FULLY_CONNECTED', inputs=[],
                   outputs=[fusion['out']])
    self._store_outputs(sg, out_op, (y,), env)

  def _eval_fused_head(self, sg_idx: int, sg: ir.Subgraph,
                       fusion: dict, env: dict) -> None:
    """Emit one matmul+argmax call for a matched greedy-head chain."""
    from ai_edge_quantizer_tpu.kernels import pallas_head
    x = self._dequant_view(sg, fusion['x'], env)
    w = env[fusion['w_tid']]
    if fusion['packed']:
      scale = self._packed_scale[(sg_idx, fusion['w_tid'])]
      # Match the unfused packed-FC compute mode so fused and unfused
      # greedy tokens agree (DRQ engages under the same gate).
      drq = (os.environ.get('AEQT_INT4_DRQ', '0') == '1'
             and w.shape[1] * 2 <= 8192)
    else:
      scale = fusion['scale']
      drq = True  # int8 DRQ semantics (reference dynamic-range runtime)
    # Vocab-tile sweep on the 256128x2048 int8 Gemma head (chained-scan
    # microbench, scripts/kernel_tune.py): bn=512 0.987 ms / 69% int8
    # peak, bn=1024 0.784 ms / 87%, bn=2048 0.790 ms — wider tiles halve
    # the per-grid-step overhead until the 2 MB block DMA saturates.
    ids = pallas_head.head_argmax_pallas(
        x, w, scale,
        packed=fusion['packed'],
        true_n=fusion['true_n'],
        bn=(int(os.environ.get('AEQT_HEAD_BN', '1024'))
            if w.shape[0] >= 65536 else 256),
        drq=drq,
        interpret=jax.default_backend() != 'tpu')
    out_op = ir.Op(opcode='ARG_MAX', inputs=[], outputs=[fusion['out']])
    self._store_outputs(sg, out_op, (ids,), env)

  def _eval_fused_qkv(self, sg_idx: int, sg: ir.Subgraph,
                      fusion: dict, env: dict) -> None:
    """Emit one norm+qkv+rope prologue call for a matched chain."""
    from ai_edge_quantizer_tpu.kernels import pallas_qkv
    x = self._dequant_view(sg, fusion['x'], env)
    gamma = self._dequant_view(sg, fusion['gamma'], env)
    w = env[fusion['w_tid']]
    scale = self._packed_scale[(sg_idx, fusion['w_tid'])]
    positions = env[fusion['positions']]
    h = fusion['h']
    cos, sin = pallas_qkv.rope_cos_sin(positions, h, fusion['rope_base'])
    # Same DRQ gate as the unfused packed-int4 FC fast path.
    drq = (os.environ.get('AEQT_INT4_DRQ', '0') == '1'
           and w.shape[1] * 2 <= 8192)
    q, k, v = pallas_qkv.qkv_rope_pallas(
        x, gamma, w, scale, cos, sin,
        nq=fusion['nq'], nk=fusion['nk'], h=h, eps=fusion['eps'],
        drq=drq, interpret=jax.default_backend() != 'tpu')
    for tid, val in ((fusion['q_out'], q), (fusion['k_out'], k),
                     (fusion['v_out'], v)):
      t = sg.tensors[tid]
      out_op = ir.Op(opcode='RESHAPE', inputs=[], outputs=[tid])
      self._store_outputs(sg, out_op, (val.reshape(t.shape),), env)

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
    key = (sg_idx, op.inputs[1])
    if key in self._packed_int4_keys:
      from ai_edge_quantizer_tpu.kernels import pallas_qmatmul
      true_n = self._packed_pad_n.get(key)
      bs = self._packed_block_size.get(key, 0)
      # Wide N-tile for huge heads: measured 549us (bn=512) vs 765 (256)
      # vs 946 (128) on the padded 256512x2048 Gemma logits matmul.
      bn = 512 if w_q.shape[0] >= 65536 else 256
      norm = self._norm_fusions.get((sg_idx, op.inputs[0]))
      if norm is not None and not bs:
        x_raw = self._dequant_view(sg, norm['x'], env)
        gamma = self._dequant_view(sg, norm['gamma'], env)
        y = pallas_qmatmul.qmatmul_pallas_int4_packed_rmsnorm(
            x_raw, gamma, w_q, self._packed_scale[key],
            bias=None if true_n is not None else bias, eps=norm['eps'],
            bn=bn, interpret=jax.default_backend() != 'tpu')
        if true_n is not None:
          y = y[..., :true_n]
          if bias is not None:
            y = y + bias
        y = ops_impl._fused_activation(
            y, op.attrs.get('fused_activation', 'NONE'))
        self._store_outputs(sg, op, (y,), env)
        return
      x_f = self._dequant_view(sg, op.inputs[0], env)
      if bs:
        y = pallas_qmatmul.qmatmul_pallas_int4_packed_blockwise(
            x_f, w_q, self._packed_scale[key],
            bias=None if true_n is not None else bias, block_size=bs,
            bn=bn, interpret=jax.default_backend() != 'tpu')
      elif (os.environ.get('AEQT_INT4_DRQ', '0') == '1'
            and w_q.shape[1] * 2 <= 8192):
        # True DRQ execution: per-row int8 activation quantization inside
        # the kernel, int8 x int8 MXU contraction (2x the bf16 MXU rate —
        # the binding constraint at serving batch sizes). Matches the
        # reference's dynamic-range runtime semantics (XNNPACK QD8).
        y = pallas_qmatmul.qmatmul_pallas_int4_packed_drq(
            x_f, w_q, self._packed_scale[key],
            bias=None if true_n is not None else bias,
            bn=bn, interpret=jax.default_backend() != 'tpu')
      elif (os.environ.get('AEQT_INT4_DRQ', '0') == '1'
            and os.environ.get('AEQT_INT4_DRQ_KBLOCK', '1') == '1'):
        # K > 8192 (FFN down projections): the K-blocked DRQ kernel keeps
        # the contraction on the int8 MXU instead of falling back to the
        # half-rate bf16 kernel (~1/3 of prefill FLOPs at Gemma shapes).
        y = pallas_qmatmul.qmatmul_pallas_int4_packed_drq_kblock(
            x_f, w_q, self._packed_scale[key],
            bias=None if true_n is not None else bias,
            bn=bn, interpret=jax.default_backend() != 'tpu')
      else:
        y = pallas_qmatmul.qmatmul_pallas_int4_packed(
            x_f, w_q, self._packed_scale[key],
            bias=None if true_n is not None else bias,
            bn=bn, interpret=jax.default_backend() != 'tpu')
      if true_n is not None:
        y = y[..., :true_n]
        if bias is not None:
          y = y + bias
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
        y = qmm.drq_matmul(x_val, w_q, jnp.asarray(q.scale), bias=bias)
      else:
        y = qmm.qmatmul(
            x_val, w_q, jnp.asarray(q.scale),
            zero_point=None if symmetric else jnp.asarray(q.zero_point),
            bias=bias, block_size=q.block_size)
    else:
      # SRQ: integer activation.
      xq = x_t.quantization
      if (
          symmetric and q.block_size == 0
          and x_val.dtype == jnp.int8 and w_q.dtype == jnp.int8
          and np.asarray(xq.scale).size == 1
          and os.environ.get('AEQT_SRQ_INT', '1') == '1'
      ):
        # True integer execution: int8 x int8 -> int32 on the MXU, zero
        # point folded through the weight row sums — 8x the f32 MXU rate
        # of the dequantize-first path (the reference's QS8 semantics).
        y = qmm.srq_matmul(
            x_val, np.asarray(xq.scale).reshape(()),
            np.asarray(xq.zero_point).reshape(()), w_q,
            jnp.asarray(q.scale), bias=bias)
      else:
        # Scaled-accumulator fallback (int16 acts, blockwise, asym w).
        x_f = quant_arith.dequantize(x_val, x_t.quantization)
        y = qmm.qmatmul(
            x_f, w_q, jnp.asarray(q.scale),
            zero_point=None if symmetric else jnp.asarray(q.zero_point),
            bias=bias, block_size=q.block_size)
    y = ops_impl._fused_activation(
        y, op.attrs.get('fused_activation', 'NONE'))
    self._store_outputs(sg, op, (y,), env)
