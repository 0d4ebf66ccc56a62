"""JAX-function importer: trace a jax callable into Graph IR.

The TPU-native on-ramp: bring a `fn(params, inputs) -> outputs` jax
function (flax/haiku apply functions fit directly), trace its jaxpr, and
get an IR graph whose constants are the params — ready for recipe-driven
quantization. `x @ w` contractions against 2-D params become
FULLY_CONNECTED (weights transposed into the IR's [out, in] layout), so
weight-quantization recipes apply exactly as for imported TFLite models.

Composite jax ops (softmax, gelu) appear decomposed into their primitives;
elementwise primitives outside the quantization vocabulary execute fine
but stay float — weight-only / dynamic-range recipes are the intended use
for imported jax models. Scope strings derive from jax param paths, so
scope regexes select layers.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np

from ai_edge_quantizer_tpu.graph import ir

# jaxpr primitive -> (opcode, attr builder). Attr builders may return None
# to reject the mapping (falls through to the generic path).
_SIMPLE_PRIMS = {
    'add': 'ADD', 'sub': 'SUB', 'mul': 'MUL', 'div': 'DIV',
    'max': 'MAXIMUM', 'tanh': 'TANH', 'logistic': 'LOGISTIC',
    'rsqrt': 'RSQRT', 'sqrt': 'SQRT', 'exp': 'EXP', 'log': 'LOG',
    'neg': 'NEG', 'abs': 'ABS', 'sign': 'SIGN', 'floor': 'FLOOR',
    'erf': 'ERF', 'select_n': 'SELECT_N', 'pow': 'POW',
    'integer_pow': 'INTEGER_POW', 'squeeze': 'RESHAPE',
    'stop_gradient': 'IDENTITY', 'convert_element_type': 'IDENTITY',
}


class _Importer:

  def __init__(self, graph: ir.Graph, subgraph: ir.Subgraph):
    self.graph = graph
    self.sg = subgraph
    self.var_to_tid: dict = {}
    self.counter = 0

  def _name(self, base: str) -> str:
    self.counter += 1
    return f'{base}_{self.counter}'

  def tid_of(self, var, jaxpr_literals=True) -> int:
    if type(var).__name__ == 'Literal':
      val = np.asarray(var.val)
      buf = self.graph.add_buffer(val)
      tid = self.sg.add_tensor(ir.Tensor(
          name=self._name('const'), shape=val.shape,
          dtype=_ir_dtype(val.dtype), buffer=buf))
      return tid
    return self.var_to_tid[var]

  def new_out(self, var, base: str) -> int:
    tid = self.sg.add_tensor(ir.Tensor(
        name=self._name(base), shape=tuple(var.aval.shape),
        dtype=_ir_dtype(var.aval.dtype)))
    self.var_to_tid[var] = tid
    return tid

  def emit(self, opcode: str, in_tids, out_tids, attrs=None) -> None:
    self.sg.ops.append(ir.Op(opcode=opcode, inputs=list(in_tids),
                             outputs=list(out_tids),
                             attrs=dict(attrs or {})))


def _ir_dtype(np_dtype) -> str:
  name = np.dtype(np_dtype).name
  return {'float64': 'float32'}.get(name, name) if name in (
      'float32', 'float16', 'bfloat16', 'int64', 'int32', 'int16', 'int8',
      'uint8', 'bool', 'float64') else 'float32'


def _is_weight(imp: _Importer, tid: int) -> bool:
  t = imp.sg.tensors[tid]
  return t.buffer >= 0 and imp.graph.buffers[t.buffer].data is not None


def _import_dot_general(imp: _Importer, eqn) -> bool:
  """x[..., K] . w[K, N] with constant w -> FULLY_CONNECTED([N, K])."""
  (lc, rc), (lb, rb) = eqn.params['dimension_numbers']
  lhs, rhs = eqn.invars
  out = eqn.outvars[0]
  lhs_tid = imp.tid_of(lhs)
  rhs_tid = imp.tid_of(rhs)
  if (
      len(rhs.aval.shape) == 2 and not lb and not rb
      and tuple(lc) == (len(lhs.aval.shape) - 1,)
      and _is_weight(imp, rhs_tid)
      and tuple(rc) in ((0,), (1,))
  ):
    w_t = imp.sg.tensors[rhs_tid]
    data = imp.graph.buffers[w_t.buffer].data
    if tuple(rc) == (0,):
      # Transpose into the IR's [out, in] convention once, at import.
      data = np.ascontiguousarray(np.asarray(data).T)
    buf = imp.graph.add_buffer(data)
    wt_tid = imp.sg.add_tensor(ir.Tensor(
        name=w_t.name + '/w', shape=data.shape, dtype=w_t.dtype,
        buffer=buf))
    out_tid = imp.new_out(out, w_t.name + '/out')
    imp.emit('FULLY_CONNECTED', [lhs_tid, wt_tid, -1], [out_tid],
             {'fused_activation': 'NONE'})
    return True
  # Generic: batch matmul over matching layouts only.
  if (
      tuple(lc) == (len(lhs.aval.shape) - 1,)
      and tuple(rc) == (len(rhs.aval.shape) - 2,)
      and tuple(lb) == tuple(range(len(lhs.aval.shape) - 2))
      and tuple(rb) == tuple(range(len(rhs.aval.shape) - 2))
  ):
    out_tid = imp.new_out(out, 'bmm')
    imp.emit('BATCH_MATMUL', [lhs_tid, rhs_tid], [out_tid], {})
    return True
  return False


def trace_to_graph(
    fn: Callable,
    params: Any,
    example_inputs: dict,
    signature_key: str = 'serving_default',
) -> ir.Graph:
  """Trace `fn(params, inputs_dict)` into a Graph.

  params: arbitrary pytree of arrays; leaf paths become tensor scope names.
  example_inputs: {input_name: array} defining the signature.
  """
  flat_params, params_treedef = jax.tree_util.tree_flatten_with_path(params)
  param_names = [
      '/'.join(_path_str(k) for k in path) or f'param_{i}'
      for i, (path, _) in enumerate(flat_params)
  ]
  param_vals = [np.asarray(v) for _, v in flat_params]
  input_names = list(example_inputs)

  def wrapped(flat_p, *inputs):
    p = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), flat_p)
    return fn(p, dict(zip(input_names, inputs)))

  jaxpr = jax.make_jaxpr(wrapped)(
      param_vals, *[example_inputs[k] for k in input_names])

  graph = ir.Graph(metadata={'source': 'jax'})
  sg = ir.Subgraph(name=signature_key)
  graph.subgraphs.append(sg)
  imp = _Importer(graph, sg)

  n_params = len(param_vals)
  for var, name, val in zip(jaxpr.jaxpr.invars[:n_params], param_names,
                            param_vals):
    buf = graph.add_buffer(val)
    tid = sg.add_tensor(ir.Tensor(
        name=name, shape=val.shape, dtype=_ir_dtype(val.dtype), buffer=buf))
    imp.var_to_tid[var] = tid
  sig_inputs = {}
  for var, name in zip(jaxpr.jaxpr.invars[n_params:], input_names):
    tid = sg.add_tensor(ir.Tensor(
        name=name, shape=tuple(var.aval.shape),
        dtype=_ir_dtype(var.aval.dtype)))
    sg.inputs.append(tid)
    sig_inputs[name] = tid
    imp.var_to_tid[var] = tid
  for var, val in zip(jaxpr.jaxpr.constvars, jaxpr.consts):
    val = np.asarray(val)
    buf = graph.add_buffer(val)
    imp.var_to_tid[var] = sg.add_tensor(ir.Tensor(
        name=imp._name('const'), shape=val.shape,
        dtype=_ir_dtype(val.dtype), buffer=buf))

  for eqn in jaxpr.jaxpr.eqns:
    _import_eqn(imp, eqn)

  sig_outputs = {}
  for i, var in enumerate(jaxpr.jaxpr.outvars):
    tid = imp.tid_of(var)
    sg.outputs.append(tid)
    sig_outputs[f'output_{i}'] = tid
  graph.signatures.append(ir.SignatureDef(
      signature_key=signature_key, subgraph_index=0,
      inputs=sig_inputs, outputs=sig_outputs))
  ir.graph_unique_tensor_names_check(graph)
  return graph


def _path_str(k) -> str:
  for attr in ('key', 'name', 'idx'):
    if hasattr(k, attr):
      return str(getattr(k, attr))
  return str(k)


def _import_eqn(imp: _Importer, eqn) -> None:
  prim = eqn.primitive.name
  if prim == 'dot_general' and _import_dot_general(imp, eqn):
    return
  if prim == 'reshape' or prim == 'squeeze':
    in_tid = imp.tid_of(eqn.invars[0])
    out_tid = imp.new_out(eqn.outvars[0], 'reshape')
    imp.emit('RESHAPE', [in_tid], [out_tid],
             {'new_shape': list(eqn.outvars[0].aval.shape)})
    return
  if prim == 'transpose':
    in_tid = imp.tid_of(eqn.invars[0])
    out_tid = imp.new_out(eqn.outvars[0], 'transpose')
    imp.emit('TRANSPOSE', [in_tid], [out_tid],
             {'perm': list(eqn.params['permutation'])})
    return
  if prim == 'broadcast_in_dim':
    in_tid = imp.tid_of(eqn.invars[0])
    out_tid = imp.new_out(eqn.outvars[0], 'broadcast')
    imp.emit('BROADCAST_IN_DIM', [in_tid], [out_tid],
             {'shape': list(eqn.outvars[0].aval.shape),
              'broadcast_dimensions': list(
                  eqn.params['broadcast_dimensions'])})
    return
  if prim == 'reduce_sum' or prim == 'reduce_max' or prim == 'reduce_min':
    opcode = {'reduce_sum': 'SUM', 'reduce_max': 'REDUCE_MAX',
              'reduce_min': 'REDUCE_MIN'}[prim]
    in_tid = imp.tid_of(eqn.invars[0])
    out_tid = imp.new_out(eqn.outvars[0], prim)
    imp.emit(opcode, [in_tid], [out_tid],
             {'axis': list(eqn.params['axes']), 'keep_dims': False})
    return
  if prim in ('custom_jvp_call', 'pjit', 'jit', 'closed_call',
              'custom_vjp_call', 'remat'):
    # Inline nested jaxprs (jax.nn.gelu etc. wrap their bodies).
    inner = eqn.params.get('call_jaxpr') or eqn.params.get('jaxpr')
    if inner is not None:
      inner_jaxpr = getattr(inner, 'jaxpr', inner)
      for outer_var, inner_var in zip(eqn.invars, inner_jaxpr.invars):
        imp.var_to_tid[inner_var] = imp.tid_of(outer_var)
      consts = getattr(inner, 'consts', getattr(inner, 'literals', []))
      for var, val in zip(inner_jaxpr.constvars, consts):
        val = np.asarray(val)
        buf = imp.graph.add_buffer(val)
        imp.var_to_tid[var] = imp.sg.add_tensor(ir.Tensor(
            name=imp._name('const'), shape=val.shape,
            dtype=_ir_dtype(val.dtype), buffer=buf))
      for inner_eqn in inner_jaxpr.eqns:
        _import_eqn(imp, inner_eqn)
      for outer_var, inner_var in zip(eqn.outvars, inner_jaxpr.outvars):
        imp.var_to_tid[outer_var] = imp.tid_of(inner_var)
      return
  opcode = _SIMPLE_PRIMS.get(prim)
  if opcode is None:
    raise NotImplementedError(
        f'jax primitive {prim!r} is not supported by the importer yet.')
  in_tids = [imp.tid_of(v) for v in eqn.invars]
  out_tid = imp.new_out(eqn.outvars[0], prim)
  attrs = {}
  if prim == 'integer_pow':
    attrs['exponent'] = int(eqn.params['y'])
  imp.emit(opcode, in_tids, [out_tid], attrs)


def _import_conv(imp: _Importer, eqn) -> bool:
  """conv_general_dilated with NHWC/HWIO/NHWC (flax Conv) -> CONV_2D."""
  dn = eqn.params['dimension_numbers']
  lhs, rhs = eqn.invars
  out = eqn.outvars[0]
  if (
      dn.lhs_spec != (0, 3, 1, 2)  # NHWC
      or dn.out_spec != (0, 3, 1, 2)
  ):
    return False
  rhs_tid = imp.tid_of(rhs)
  if not _is_weight(imp, rhs_tid):
    return False
  strides = tuple(eqn.params['window_strides'])
  if strides[0] != strides[1]:
    return False
  padding = eqn.params['padding']
  pad_name = None
  kh, kw = None, None
  w_t = imp.sg.tensors[rhs_tid]
  data = np.asarray(imp.graph.buffers[w_t.buffer].data)
  if dn.rhs_spec == (3, 2, 0, 1):  # HWIO kernel [kh, kw, in, out]
    data = np.ascontiguousarray(np.transpose(data, (3, 0, 1, 2)))
  elif dn.rhs_spec == (0, 3, 1, 2):  # OHWI already
    pass
  else:
    return False
  out_c, kh, kw, in_c = data.shape
  fgc = eqn.params.get('feature_group_count', 1)
  lhs_tid = imp.tid_of(lhs)
  pads = tuple(map(tuple, padding))
  if pads == ((0, 0), (0, 0)):
    pad_name = 'VALID'
  else:
    ih = lhs.aval.shape[1]
    same_lo = ((ih - 1) * strides[0] + kh - ih) // 2
    pad_name = 'SAME' if pads[0][0] in (same_lo, (kh - 1) // 2) \
        and pads[0] == pads[1] else None
  if pad_name is None:
    # Arbitrary (possibly asymmetric) padding: explicit PAD then VALID.
    in_shape = tuple(lhs.aval.shape)
    padded_shape = (in_shape[0], in_shape[1] + pads[0][0] + pads[0][1],
                    in_shape[2] + pads[1][0] + pads[1][1], in_shape[3])
    pad_arr = np.asarray(
        [[0, 0], list(pads[0]), list(pads[1]), [0, 0]], np.int32)
    pad_buf = imp.graph.add_buffer(pad_arr)
    pad_const = imp.sg.add_tensor(ir.Tensor(
        name=imp._name('conv_pad'), shape=pad_arr.shape, dtype='int32',
        buffer=pad_buf))
    padded_tid = imp.sg.add_tensor(ir.Tensor(
        name=imp._name('conv_padded'), shape=padded_shape,
        dtype='float32'))
    imp.emit('PAD', [lhs_tid, pad_const], [padded_tid], {})
    lhs_tid = padded_tid
    pad_name = 'VALID'
  if fgc != 1:
    # Depthwise: fgc == in channels, kernel HWIO [kh, kw, 1, C] arrived as
    # OHWI [C, kh, kw, 1] -> IR layout [1, kh, kw, C].
    if fgc != lhs.aval.shape[3] or in_c != 1 or out_c != fgc:
      return False
    data = np.ascontiguousarray(np.transpose(data, (3, 1, 2, 0)))
    buf = imp.graph.add_buffer(data)
    wt_tid = imp.sg.add_tensor(ir.Tensor(
        name=w_t.name + '/w', shape=data.shape, dtype='float32',
        buffer=buf))
    out_tid = imp.new_out(out, w_t.name + '/out')
    imp.emit('DEPTHWISE_CONV_2D', [lhs_tid, wt_tid, -1], [out_tid],
             {'stride': int(strides[0]), 'padding': pad_name,
              'fused_activation': 'NONE'})
    return True
  buf = imp.graph.add_buffer(data)
  wt_tid = imp.sg.add_tensor(ir.Tensor(
      name=w_t.name + '/w', shape=data.shape, dtype='float32', buffer=buf))
  out_tid = imp.new_out(out, w_t.name + '/out')
  imp.emit('CONV_2D', [lhs_tid, wt_tid, -1], [out_tid],
           {'stride': int(strides[0]), 'padding': pad_name,
            'fused_activation': 'NONE'})
  return True


# Register conv into the eqn dispatcher.
_ORIG_IMPORT_EQN = _import_eqn


def _import_eqn_with_conv(imp: _Importer, eqn) -> None:
  if eqn.primitive.name == 'conv_general_dilated' and _import_conv(imp, eqn):
    return
  _ORIG_IMPORT_EQN(imp, eqn)


_import_eqn = _import_eqn_with_conv


def trace_flax_module(module, variables, example_inputs: dict,
                      signature_key: str = 'serving_default',
                      method=None):
  """Trace a flax linen module's apply into Graph IR.

  variables: the module's variable collections ({'params': ...}).
  example_inputs: {arg_name: array} passed as apply kwargs.
  """
  def fn(vars_, inputs):
    return module.apply(vars_, method=method, **inputs)

  return trace_to_graph(fn, variables, example_inputs,
                        signature_key=signature_key)
