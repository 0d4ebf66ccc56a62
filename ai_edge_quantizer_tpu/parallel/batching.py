"""Continuous-batching decode server.

Serves a quantized decoder over a fixed pool of batch slots: requests are
admitted into free slots (prefill runs per request and writes that slot's
KV cache), then ONE jitted batched decode step advances every active slot
per tick — sequences join and leave the batch without ever stalling the
others. KV caches live on device for the server's lifetime; per-slot write
positions use the model's one-hot scatter cache update.

Multi-host scaling: shard the slot pool over the 'dp' mesh axis (each host
runs its own admission queue; weights replicated or 'tp'-sharded via
parallel.sharding); tokens/s scales with hosts since decode steps are
batch-local.

This subsystem is NEW relative to the reference (SURVEY.md §2.6: the
reference has no serving runtime); its calibration-facing seams (KV-cache
scale alignment) come from utils/calibration_utils.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _jit(fn, **kw):
  """jax.jit with the serving scoped-VMEM compiler option threaded in.

  Wide-tile kernels (MLP bf=2048 at 97% int8 peak) need the Mosaic
  scoped-VMEM limit raised past the 16 MiB default; the tunnel forwards
  per-compile compiler options (AEQT_VMEM_LIMIT_KIB, 0 disables).
  """
  import os as _os
  kib = int(_os.environ.get('AEQT_VMEM_LIMIT_KIB', '0') or 0)
  if kib:
    kw.setdefault('compiler_options',
                  {'xla_tpu_scoped_vmem_limit_kib': kib})
  return jax.jit(fn, **kw)


def greedy_sampler(logits: np.ndarray) -> int:
  return int(np.argmax(logits))


def make_topk_sampler(k: int = 40, temperature: float = 1.0,
                      seed: int = 0):
  """Top-k sampling with temperature (host-side, per slot)."""
  rng = np.random.default_rng(seed)

  def sample(logits: np.ndarray) -> int:
    scaled = logits.astype(np.float64) / max(temperature, 1e-6)
    top = np.argpartition(scaled, -k)[-k:]
    p = np.exp(scaled[top] - scaled[top].max())
    p /= p.sum()
    return int(rng.choice(top, p=p))

  return sample


def make_topp_sampler(p: float = 0.95, temperature: float = 1.0,
                      seed: int = 0):
  """Nucleus (top-p) sampling with temperature."""
  rng = np.random.default_rng(seed)

  def sample(logits: np.ndarray) -> int:
    scaled = logits.astype(np.float64) / max(temperature, 1e-6)
    probs = np.exp(scaled - scaled.max())
    probs /= probs.sum()
    order = np.argsort(probs)[::-1]
    csum = np.cumsum(probs[order])
    cutoff = int(np.searchsorted(csum, p)) + 1
    keep = order[:cutoff]
    kp = probs[keep] / probs[keep].sum()
    return int(rng.choice(keep, p=kp))

  return sample

from ai_edge_quantizer_tpu.execution import executor as executor_lib
from ai_edge_quantizer_tpu.graph import ir
from ai_edge_quantizer_tpu.models import gemma


@dataclasses.dataclass
class Request:
  request_id: int
  prompt: np.ndarray          # [T] int32 token ids
  max_new_tokens: int
  generated: list = dataclasses.field(default_factory=list)
  done: bool = False
  status: str = 'queued'      # queued|running|done|cancelled|timeout
  deadline: Optional[float] = None   # absolute time.monotonic() limit
  submitted_at: float = 0.0
  first_token_at: Optional[float] = None
  finished_at: Optional[float] = None


@dataclasses.dataclass
class _Slot:
  request: Optional[Request] = None
  pos: int = 0  # next cache write position

  @property
  def active(self) -> bool:
    return self.request is not None


class DecodeServer:
  """Continuous batching over a quantized multi-signature decoder graph."""

  def __init__(
      self,
      graph: ir.Graph,
      cfg: gemma.DecoderConfig,
      batch_slots: int,
      weights: Optional[dict] = None,
      sample_fn: Optional[Callable] = None,
      prefill_batch: int = 1,
      eos_token_id: Optional[int] = None,
      request_timeout_s: Optional[float] = None,
      pack_weights: bool = False,
      mesh=None,
      activation_dtype: str = 'float32',
      admit_budget_groups: Optional[int] = None,
      starvation_age_s: float = 2.0,
  ):
    """graph must have 'decode' (batch=batch_slots, onehot cache update)
    and 'prefill' (batch=1) signatures.

    mesh: optional jax.sharding.Mesh with 'dp'/'tp' axes. The slot pool
    (KV caches + per-tick decode inputs) shards over 'dp' (batch_slots
    must divide by dp); weights shard per parallel.sharding rules
    (tp column/row-parallel, quantized-dim congruent). One server then
    drives a whole slice; decode ticks scale with dp since slots are
    batch-local.

    admit_budget_groups: cap admissions per tick to this many prefill
    groups (prefill_batch requests each); the rest stay queued for the
    next tick. Interleaves large admission waves with decode ticks so a
    cold burst of hundreds of requests does not stall running decodes
    for the whole wave (TTFT tail control). None = admit everything.
    """
    self.cfg = cfg
    self.batch_slots = batch_slots
    self.graph = graph
    self._mesh = mesh
    self._cache_sharding = None
    self._input_sharding = None
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      if batch_slots % mesh.shape['dp'] != 0:
        raise ValueError(
            f"batch_slots={batch_slots} must divide by the mesh dp axis "
            f"({mesh.shape['dp']}).")
      self._cache_sharding = NamedSharding(mesh, P('dp'))
      self._input_sharding = NamedSharding(mesh, P('dp'))
    # activation_dtype='bfloat16' is the TPU serving mode (float
    # activations — including any float KV traffic — flow bf16, feeding
    # the MXU natively); 'float32' stays bit-faithful to the offline
    # pipeline.
    self._executor = executor_lib.GraphExecutor(
        graph, activation_dtype=activation_dtype)
    if weights is not None:
      self._executor._weights = weights
    if pack_weights:
      # Packed-int4 + norm-fusion serving fast paths (TPU production mode).
      self._executor.prepare_serving_weights()
    if mesh is not None:
      from ai_edge_quantizer_tpu.parallel import sharding as sharding_lib
      w_shard = sharding_lib.weight_shardings(
          graph, self._executor._weights, mesh)
      self._executor._weights = {
          k: jax.device_put(v, w_shard[k])
          for k, v in self._executor._weights.items()
      }
    self._admit_budget_groups = admit_budget_groups
    # Aging override for plan-aware admission: once the oldest queued
    # request has waited this long, its plan's (possibly partial) group
    # jumps ahead of full groups — full-group preference must not starve
    # rare chunk-count plans under sustained load (ADVICE r4).
    self._starvation_age_s = starvation_age_s
    self._slots = [_Slot() for _ in range(batch_slots)]
    self._queue: collections.deque = collections.deque()
    # Per-plan FIFO buckets, rebuilt lazily when the queue has been
    # mutated outside _admit (submit/cancel/expire); _admit itself keeps
    # them consistent, so steady-state admission skips the O(queue)
    # rebuild per tick (ADVICE r4).
    self._plan_buckets: Optional[dict] = None
    self._next_id = 0
    self._sample = sample_fn or (lambda logits: int(np.argmax(logits)))
    self._eos = eos_token_id
    self._default_timeout = request_timeout_s
    # Serving metrics (read via .metrics).
    self.metrics = {
        'tokens_generated': 0,
        'requests_completed': 0,
        'requests_cancelled': 0,
        'requests_timeout': 0,
        'decode_ticks': 0,
        'prefills': 0,
        'prefill_groups': 0,
        'prefill_pad_rows': 0,  # padded (wasted) rows across all groups
        'ttft_sum_s': 0.0,        # time-to-first-token accumulator
        'latency_sum_s': 0.0,     # request end-to-end accumulator
    }

    # Context-length buckets: one decode program per bucket; the server
    # runs the smallest program covering the longest active sequence
    # (static-shape paged-attention analog — short conversations read a
    # fraction of the max cache).
    self._buckets = list(graph.metadata.get('decode_buckets', []))
    if self._buckets:
      self._bucket = self._buckets[0]
      dec_key = f'decode_{self._bucket}'
    else:
      self._bucket = cfg.max_seq_len
      dec_key = 'decode'
    dec_sig = graph.signature_by_key(dec_key)
    # Device-side greedy sampling: decode signatures built with
    # greedy_head=True emit `next_tokens` in-graph (FC + ARG_MAX fused in
    # the vocab-tiled head kernel). When the caller wants greedy anyway
    # (no sample_fn), a tick then fetches B int32 ids instead of a
    # [B, 1, vocab] logits array — the logits never leave the device.
    self._device_greedy = (
        'next_tokens' in dec_sig.outputs and sample_fn is None)
    if 'next_tokens' in dec_sig.outputs and sample_fn is not None:
      raise ValueError(
          'This serving graph was built with greedy_head=True (decode '
          'emits next_tokens, not logits) — a custom sample_fn cannot '
          'run. Build with greedy_head=False for host-side sampling.')
    graph_batch = graph.subgraphs[dec_sig.subgraph_index].tensors[
        dec_sig.inputs['tokens']].shape[0]
    if graph_batch != batch_slots:
      raise ValueError(
          f'DecodeServer(batch_slots={batch_slots}) does not match the '
          f"graph's decode batch ({graph_batch}); build the serving graph "
          'with the same batch_slots.')

    self._decode_fns: dict = {}

    def _decode_fn_for(bucket: int):
      if bucket not in self._decode_fns:
        key = f'decode_{bucket}' if self._buckets else 'decode'
        sig = self.graph.signature_by_key(key)

        def _decode_step(weights, inputs, caches, _idx=sig.subgraph_index,
                         _key=key):
          # caches as a separate DONATED arg: the output caches reuse the
          # input cache buffers in place — no per-tick copy of the pool.
          return self._executor._run_signature(
              _idx, _key, False, weights, {**inputs, **caches})

        self._decode_fns[bucket] = _jit(_decode_step, donate_argnums=(2,))
      return self._decode_fns[bucket]

    self._decode_fn_for = _decode_fn_for
    self.metrics['bucket_switches'] = 0
    pre_sig = graph.signature_by_key('prefill')
    self._prefill_fn = _jit(functools.partial(
        self._executor._run_signature, pre_sig.subgraph_index, 'prefill',
        False))
    pre_tokens_shape = graph.subgraphs[
        pre_sig.subgraph_index].tensors[pre_sig.inputs['tokens']].shape
    self._prefill_batch = pre_tokens_shape[0]
    self._prefill_len = pre_tokens_shape[1]
    if self._prefill_batch > batch_slots:
      raise ValueError(
          f'prefill batch ({self._prefill_batch}) exceeds batch_slots '
          f'({batch_slots}); build the serving graph with '
          'prefill_batch <= batch_slots.')
    self._prefill_device_masks = bool(
        graph.metadata.get('prefill_device_masks'))
    self._prefill_tail_len = int(graph.metadata.get('prefill_tail_len', 0))
    if self._prefill_tail_len and not graph.metadata.get(
        'prefill_device_masks'):
      raise ValueError('prefill_tail_len requires prefill_device_masks '
                       '(the host mask builder is fixed-T).')
    if self._prefill_tail_len:
      tail_sig = graph.signature_by_key('prefill_tail')
      self._prefill_tail_fn = _jit(functools.partial(
          self._executor._run_signature, tail_sig.subgraph_index,
          'prefill_tail', False))
    self._prefill_greedy = 'next_tokens' in pre_sig.outputs
    if self._prefill_greedy and sample_fn is not None:
      raise ValueError(
          'This serving graph was built with prefill_greedy=True (prefill '
          'emits next_tokens, not logits) — a custom sample_fn cannot '
          'run. Build with prefill_greedy=False for host-side sampling.')
    # Per-request time-to-first-token samples (seconds), appended at each
    # admission — percentile source for serving benchmarks.
    self.ttft_log: list = []

    NK, H = cfg.num_kv_heads, cfg.head_dim
    self._kv_group = int(graph.metadata.get('kv_int4_group', 0))
    dec_sg = graph.subgraphs[dec_sig.subgraph_index]
    self._cache_dtypes = {}
    kinds = ('k', 'v', 's') if self._kv_group else ('k', 'v')
    for li in range(cfg.num_layers):
      for kind in kinds:
        key = f'layer_{li}_{kind}_cache_in'
        t = dec_sg.tensors[dec_sig.inputs[key]]
        self._cache_dtypes[key] = {
            'int8': jnp.int8, 'uint8': jnp.uint8,
            'bfloat16': jnp.bfloat16}.get(t.dtype, jnp.float32)
    self._alloc_caches(self._bucket)
    self._last_tokens = np.zeros((batch_slots, 1), np.int32)

    @functools.partial(_jit, donate_argnums=(0,))
    def _slot_writer(caches, new_rows, slot_ids, valid):
      """Scatter a group's prefilled rows into the slot pool — ONE jitted
      call per admission group, at ONE fixed shape.

      slot_ids is always length prefill_batch (a partial group is padded
      with DISTINCT spare slot indices whose `valid` flag is False); a
      padded row writes back the slot's current content, so the program
      shape — and its compilation — is independent of the group size.
      Per-group recompiles (one per distinct size) cost tens of seconds
      each through the tunnel's compile path; separate un-jitted
      per-layer writes cost 2L host round-trips per admission.

      With an int4-group decode pool (kv_int4_group graphs), the float
      prefill caches are quantized HERE — per-row per-group codes + the
      bf16 sidecar — before the scatter; prefill itself stays float."""
      return self._scatter_body(caches, new_rows, slot_ids, valid)

    self._slot_writer = _slot_writer

  def _scatter_body(self, caches, new_rows, slot_ids, valid):
    """Traceable scatter of a prefilled group into the slot pool — shared
    by the standalone _slot_writer and the single-dispatch prefill chain
    (_prefill_chain_for). Returns only the written cache entries."""
    from ai_edge_quantizer_tpu.kernels import pallas_attention as pa
    written = {}
    group = self._kv_group
    for li in range(self.cfg.num_layers):
      k_key = f'layer_{li}_k_cache_in'
      v_key = f'layer_{li}_v_cache_in'
      k_rows = new_rows[k_key][:slot_ids.shape[0]]
      v_rows = new_rows[v_key][:slot_ids.shape[0]]
      k_cache = caches[k_key]
      v_cache = caches[v_key]
      if not group:
        for key, cache, rows in ((k_key, k_cache, k_rows),
                                 (v_key, v_cache, v_rows)):
          if rows.shape[2] > cache.shape[2]:
            rows = rows[:, :, :cache.shape[2], :]
          cur = cache[slot_ids]
          rows = jnp.where(valid[:, None, None, None],
                           rows.astype(cache.dtype), cur)
          written[key] = cache.at[slot_ids].set(rows)
        continue
      s_key = f'layer_{li}_s_cache_in'
      s_cache = caches[s_key]
      sp = k_cache.shape[2]
      k_rows = k_rows[:, :, :sp, :].astype(jnp.float32)
      v_rows = v_rows[:, :, :sp, :].astype(jnp.float32)
      kp, ks, km = pa.quantize_k_rows_int4_asym(k_rows, group)
      vp, vs = pa.quantize_v_rows_int4_group(v_rows, group)
      sidecar = pa.build_kv_sidecar_group(ks, km, vs)  # [Bp,NK,3NG,S]
      for key, cache, rows, vmask in (
          (k_key, k_cache, kp, valid[:, None, None, None]),
          (v_key, v_cache, vp, valid[:, None, None, None]),
          (s_key, s_cache, sidecar, valid[:, None, None, None])):
        cur = cache[slot_ids]
        rows = jnp.where(vmask, rows.astype(cache.dtype), cur)
        written[key] = cache.at[slot_ids].set(rows)
    return written

  def _prefill_chain_for(self, num_chunks: int, tail: bool):
    """One jitted program for a whole admission group: every chunk pass,
    the slot-pool scatter, and the first-token gather, in ONE dispatch.

    The legacy path dispatches each chunk pass, the slot writer, and the
    token gather separately — 3-6 host dispatches per group, each paying
    the tunnel's per-call submission cost (measured ~5 ms/request of
    admission wall in SERVER_BENCH_r04). Chaining them server-side keeps
    per-plan program identity (one compile per (num_chunks, tail) plan,
    persistent-cache friendly) and donates the cache pool end to end.
    Zero first-chunk caches are materialized in-graph instead of being
    passed in. Engages only for prefill_device_masks graphs (the host
    mask builder is per-pass by construction)."""
    if not hasattr(self, '_prefill_chain_fns'):
      self._prefill_chain_fns = {}
    key = (num_chunks, tail)
    if key in self._prefill_chain_fns:
      return self._prefill_chain_fns[key]
    cfg, T, Bp = self.cfg, self._prefill_len, self._prefill_batch
    Tt = self._prefill_tail_len
    pre_sig = self.graph.signature_by_key('prefill')
    pre_sg = self.graph.subgraphs[pre_sig.subgraph_index]
    head_cols_mode = bool(self.graph.metadata.get('prefill_head_cols'))
    zero_specs = {}
    for li in range(cfg.num_layers):
      for kind in ('k', 'v'):
        ck = f'layer_{li}_{kind}_cache_in'
        t = pre_sg.tensors[pre_sig.inputs[ck]]
        zero_specs[ck] = (tuple(t.shape),
                          jnp.int8 if t.dtype == 'int8' else jnp.float32)
    passes = [(c * T, T, pre_sig.subgraph_index, 'prefill')
              for c in range(num_chunks)]
    if tail:
      tail_sig = self.graph.signature_by_key('prefill_tail')
      passes.append((num_chunks * T, Tt, tail_sig.subgraph_index,
                     'prefill_tail'))

    def chain(weights, caches, tok_mat, cols, slot_ids, valid):
      chunk_caches = {ck: jnp.zeros(shape, dt)
                      for ck, (shape, dt) in zero_specs.items()}
      out = None
      for start, span, idx, sig_key in passes:
        inputs = {
            'tokens': tok_mat[:, start:start + span],
            'positions': jnp.broadcast_to(
                jnp.arange(span, dtype=jnp.int32) + start, (Bp, span)),
            'cache_pos': jnp.array([0, 0, start, 0], jnp.int32),
        }
        if head_cols_mode:
          inputs['head_cols'] = jnp.clip(cols, 0, span - 1).reshape(Bp, 1)
        inputs.update(chunk_caches)
        out = self._executor._run_signature(idx, sig_key, False, weights,
                                            inputs)
        chunk_caches = {
            f'layer_{li}_{kind}_cache_in': out[f'layer_{li}_{kind}_cache']
            for li in range(cfg.num_layers) for kind in ('k', 'v')
        }
      written = self._scatter_body(caches, chunk_caches, slot_ids, valid)
      out_key = 'next_tokens' if self._prefill_greedy else 'logits'
      if head_cols_mode:
        first = out[out_key][:, 0]
      else:
        first = out[out_key][jnp.arange(Bp), cols]
      return first, written

    fn = _jit(chain, donate_argnums=(1,))
    self._prefill_chain_fns[key] = fn
    return fn

  def _cache_shape(self, key: str, bucket: int):
    cfg = self.cfg
    if self._kv_group:
      if key.split('_')[2] == 's':  # sidecar: [B, NK, 3NG, S]
        ng3 = 3 * (cfg.head_dim // self._kv_group)
        return (self.batch_slots, cfg.num_kv_heads, ng3, bucket)
      return (self.batch_slots, cfg.num_kv_heads, bucket,
              cfg.head_dim // 2)
    return (self.batch_slots, cfg.num_kv_heads, bucket, cfg.head_dim)

  def prefill_zero_caches(self) -> dict:
    """Zero cache inputs shaped/typed from the PREFILL signature tensors.

    The prefill program's cache signature differs from the decode pool's
    in kv_int4_group mode (float [.., H] prefill caches vs packed int8 +
    's' sidecar decode pools) — deriving warm-pass inputs from
    `_cache_dtypes` silently mismatches there (ADVICE r4). Benches and
    profilers should use this instead.
    """
    sig = self.graph.signature_by_key('prefill')
    sg = self.graph.subgraphs[sig.subgraph_index]
    out = {}
    for name, tid in sig.inputs.items():
      if not name.endswith('_cache_in'):
        continue
      t = sg.tensors[tid]
      dt = jnp.int8 if t.dtype == 'int8' else jnp.float32
      out[name] = jnp.zeros(tuple(t.shape), dt)
    return out

  def _alloc_caches(self, bucket: int) -> None:
    self._caches = {
        key: jnp.zeros(self._cache_shape(key, bucket), dtype)
        for key, dtype in self._cache_dtypes.items()
    }
    if self._cache_sharding is not None:
      self._caches = {k: jax.device_put(v, self._cache_sharding)
                      for k, v in self._caches.items()}
    self._bucket = bucket

  def _fit_bucket(self, need_len: int) -> None:
    """Grow (pad) or reset the cache pool to cover need_len positions."""
    if not self._buckets:
      return
    target = next((s for s in self._buckets if s >= need_len),
                  self._buckets[-1])
    if target > self._bucket:
      pad = target - self._bucket
      def _pad(key, v):
        if self._kv_group and key.split('_')[2] == 's':
          return jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
      self._caches = {key: _pad(key, v)
                      for key, v in self._caches.items()}
      if self._cache_sharding is not None:
        self._caches = {k: jax.device_put(v, self._cache_sharding)
                        for k, v in self._caches.items()}
      self._bucket = target
      self.metrics['bucket_switches'] += 1
    elif target < self._bucket and not any(
        s.active for s in self._slots):
      # Idle: shrink back for the next burst (contents are dead).
      self._alloc_caches(target)
      self.metrics['bucket_switches'] += 1

  # -- public API -----------------------------------------------------------

  def max_prompt_len(self) -> int:
    """Longest admissible prompt: whole prefill chunks that fit the cache."""
    S, T = self.cfg.max_seq_len, self._prefill_len
    return S if S % T == 0 else (S // T) * T

  def submit(self, prompt, max_new_tokens: int = 16,
             timeout_s: Optional[float] = None) -> int:
    now = time.monotonic()
    prompt = np.asarray(prompt, np.int32)
    if prompt.size > self.max_prompt_len():
      # Never silently drop prompt tail: a prompt that cannot fit the KV
      # cache is a caller error, not a truncation.
      raise ValueError(
          f'prompt of {prompt.size} tokens exceeds the maximum admissible '
          f'length {self.max_prompt_len()} '
          f'(max_seq_len={self.cfg.max_seq_len}, '
          f'prefill chunk={self._prefill_len}).')
    timeout_s = timeout_s if timeout_s is not None else self._default_timeout
    req = Request(self._next_id, prompt,
                  max_new_tokens, submitted_at=now,
                  deadline=(now + timeout_s) if timeout_s is not None else None)
    self._next_id += 1
    self._queue.append(req)
    self._plan_buckets = None
    return req.request_id

  def cancel(self, request_id: int) -> bool:
    """Cancel a queued or running request; returns whether it was found."""
    for req in list(self._queue):
      if req.request_id == request_id:
        self._queue.remove(req)
        self._plan_buckets = None
        self._finish(req, 'cancelled')
        return True
    for slot in self._slots:
      if slot.active and slot.request.request_id == request_id:
        self._finish(slot.request, 'cancelled')
        slot.request = None
        return True
    return False

  def stats(self) -> dict:
    """Metrics snapshot plus live queue/slot state and derived latencies."""
    done = max(self.metrics['requests_completed'], 1)
    first = max(self.metrics['prefills'], 1)
    return {
        **self.metrics,
        'queue_depth': len(self._queue),
        'slots_active': sum(1 for s in self._slots if s.active),
        'slots_total': self.batch_slots,
        'mean_ttft_s': self.metrics['ttft_sum_s'] / first,
        'mean_request_latency_s': self.metrics['latency_sum_s'] / done,
    }

  def has_work(self) -> bool:
    return bool(self._queue) or any(s.active for s in self._slots)

  def step(self) -> dict:
    """Admit waiting requests, run one batched decode tick.

    Returns {request_id: newly generated token} for this tick.
    """
    self._expire()
    if (self._buckets and self._queue
        and not any(s.active for s in self._slots)
        and self._bucket != self._buckets[0]):
      # Pool idle: restart the burst in the smallest bucket.
      self._alloc_caches(self._buckets[0])
      self.metrics['bucket_switches'] += 1
    self._admit()
    active = [i for i, s in enumerate(self._slots) if s.active]
    if not active:
      return {}
    self._fit_bucket(max(self._slots[i].pos for i in active) + 1)
    decode_inputs = self._decode_inputs()
    if self._input_sharding is not None:
      decode_inputs = {k: jax.device_put(v, self._input_sharding)
                       for k, v in decode_inputs.items()}
    out = self._decode_fn_for(self._bucket)(
        self._executor._weights, decode_inputs, self._caches)
    for key in self._cache_dtypes:
      self._caches[key] = out[key[:-3]]
    if self._device_greedy:
      tokens = np.asarray(out['next_tokens'])  # [B, 1] int32
      logits = None
    else:
      logits = np.asarray(out['logits'])  # [B, 1, vocab]
    self.metrics['decode_ticks'] += 1
    emitted = {}
    for i in active:
      slot = self._slots[i]
      token = (int(tokens[i, 0]) if logits is None
               else self._sample(logits[i, 0]))
      slot.request.generated.append(token)
      emitted[slot.request.request_id] = token
      self._last_tokens[i, 0] = token
      slot.pos += 1
      self.metrics['tokens_generated'] += 1
      if (
          len(slot.request.generated) >= slot.request.max_new_tokens
          or slot.pos >= self.cfg.max_seq_len
          or (self._eos is not None and token == self._eos)
      ):
        self._finish(slot.request, 'done')
        slot.request = None
        self.metrics['requests_completed'] += 1
    return emitted

  def step_chunk(self, n: int) -> dict:
    """Admit, then run n decode ticks in ONE on-device lax.scan.

    The sampled token feeds the next tick on device, so the host syncs
    once per n tokens instead of once per token — through a high-latency
    link the per-tick round-trip (~28 ms vs a ~6 ms device step)
    otherwise dominates serving throughput. Requires a graph built with
    greedy_head=True and device_masks=True (tokens/positions are the only
    host inputs and sampling happens in-graph). Slots that finish inside
    the chunk have their surplus tokens discarded (their cache writes are
    masked out by position for any future occupant). Falls back to n
    plain step() calls when the graph can't support it.

    Returns {request_id: [tokens emitted this chunk]}.
    """
    if n <= 1 or not (
        self._device_greedy
        and self.graph.metadata.get('decode_device_masks')):
      merged: dict = {}
      for _ in range(n):
        for rid, tok in self.step().items():
          merged.setdefault(rid, []).append(tok)
      return merged
    self._expire()
    if (self._buckets and self._queue
        and not any(s.active for s in self._slots)
        and self._bucket != self._buckets[0]):
      self._alloc_caches(self._buckets[0])
      self.metrics['bucket_switches'] += 1
    # Deferred-fetch admission: newly admitted slots join THIS chunk; the
    # wave's first tokens stay on device (merged into the token input
    # below) and resolve with the chunk fetch — one round-trip for both.
    pending = self._admit(defer_fetch=True) or []
    active = [i for i, s in enumerate(self._slots) if s.active]
    if not active:
      return {}
    self._fit_bucket(max(self._slots[i].pos for i in active) + n)
    inputs = self._decode_inputs()
    tokens0 = jnp.asarray(inputs['tokens'])
    positions0 = jnp.asarray(inputs['positions'])
    if pending:
      merge = self._merge_first_fn()
      for _, (first, ids, valid) in pending:
        tokens0 = merge(tokens0, first, jnp.asarray(ids),
                        jnp.asarray(valid))
    fn = self._chunk_fn_for(self._bucket, n)
    toks, self._caches = fn(self._executor._weights, self._caches,
                            tokens0, positions0)
    if pending:
      fetched = jax.device_get(
          [toks] + [arr for _, (arr, _, _) in pending])
      toks = fetched[0]
      self._resolve_admissions(pending, fetched[1:])
    else:
      toks = np.asarray(toks)  # [n, B, 1] int32
    self.metrics['decode_ticks'] += n
    emitted: dict = {}
    for i in active:
      slot = self._slots[i]
      for step_i in range(n):
        if slot.request is None:
          break
        token = int(toks[step_i, i, 0])
        slot.request.generated.append(token)
        emitted.setdefault(slot.request.request_id, []).append(token)
        self._last_tokens[i, 0] = token
        slot.pos += 1
        self.metrics['tokens_generated'] += 1
        if (len(slot.request.generated) >= slot.request.max_new_tokens
            or slot.pos >= self.cfg.max_seq_len
            or (self._eos is not None and token == self._eos)):
          self._finish(slot.request, 'done')
          slot.request = None
          self.metrics['requests_completed'] += 1
    return emitted

  def _chunk_fn_for(self, bucket: int, n: int):
    if not hasattr(self, '_chunk_fns'):
      self._chunk_fns = {}
    key = (bucket, n)
    if key not in self._chunk_fns:
      sig_key = f'decode_{bucket}' if self._buckets else 'decode'
      sig = self.graph.signature_by_key(sig_key)
      cache_keys = sorted(self._cache_dtypes)
      seq_cap = bucket

      def chunk(weights, caches, tokens, positions, _idx=sig.subgraph_index,
                _key=sig_key):
        def body(carry, _):
          caches_c, tok, pos = carry
          out = self._executor._run_signature(
              _idx, _key, False, weights,
              {'tokens': tok, 'positions': pos, **caches_c})
          new_caches = {k: out[k[:-3]] for k in cache_keys}
          nxt = out['next_tokens'].astype(jnp.int32)
          pos2 = jnp.minimum(pos + 1, seq_cap - 1)
          return (new_caches, nxt, pos2), nxt

        (caches, _, _), toks = jax.lax.scan(
            body, (caches, tokens, positions), None, length=n)
        return toks, caches

      self._chunk_fns[key] = _jit(chunk, donate_argnums=(1,))
    return self._chunk_fns[key]

  def run_to_completion(self, max_ticks: int = 10000) -> None:
    for _ in range(max_ticks):
      if not self.has_work():
        return
      self.step()

  # -- internals ------------------------------------------------------------

  def _finish(self, req: Request, status: str) -> None:
    req.status = status
    req.done = True
    req.finished_at = time.monotonic()
    self.metrics['latency_sum_s'] += req.finished_at - req.submitted_at
    if status == 'cancelled':
      self.metrics['requests_cancelled'] += 1
    elif status == 'timeout':
      self.metrics['requests_timeout'] += 1

  def _expire(self) -> None:
    """Time out queued and running requests past their deadline."""
    now = time.monotonic()
    for req in [r for r in self._queue
                if r.deadline is not None and now > r.deadline]:
      self._queue.remove(req)
      self._plan_buckets = None
      self._finish(req, 'timeout')
    for slot in self._slots:
      if (slot.active and slot.request.deadline is not None
          and now > slot.request.deadline):
        self._finish(slot.request, 'timeout')
        slot.request = None

  def _admit(self, defer_fetch: bool = False):
    """Admit queued requests into free slots.

    Admissions are grouped by prefill chunk count and prefilled up to
    prefill_batch requests per pass (one weight stream, one dispatch chain
    for the whole group), and every group's first-token fetch is deferred
    to ONE host sync at the end of the wave — per-admission blocking
    round-trips through a high-latency link otherwise dominate serving
    throughput (measured 264 tok/s with serial per-request prefills vs a
    ~31k tok/s decode loop).
    """
    if not self._queue:
      return
    free = [i for i, s in enumerate(self._slots) if not s.active]
    if not free:
      return
    cap = len(free)
    if self._admit_budget_groups:
      cap = min(cap, self._admit_budget_groups * self._prefill_batch)
    T, Bp = self._prefill_len, self._prefill_batch
    Tt = self._prefill_tail_len

    def plan_of(req):
      full, rem = divmod(req.prompt.size, T)
      if rem == 0 and full > 0:
        return (full, False)
      if Tt and 0 < rem <= Tt:
        # The final partial chunk pads only to the short tail program.
        return (full, True)
      return (full + 1, False)

    # Plan-aware selection: draw admissions from the queue so groups are
    # FULL wherever the queue allows. Raw FIFO draws a mid-flight wave of
    # N free slots from a mixed-length queue and splits it into
    # ~len(plans) partial groups — each padded to Bp rows of full prefill
    # compute (the "~16% padded tokens" residual in ROUND4_NOTES). Full
    # groups are taken oldest-plan first; remaining capacity is filled
    # with as few partial groups as possible, the oldest waiter's plan
    # first, then largest-leftover first. An AGED request (waited past
    # starvation_age_s) overrides all of it: its plan's group — partial
    # or not — goes first, so full-group preference can never starve a
    # rare chunk-count plan indefinitely.
    if self._plan_buckets is None:
      buckets: dict = {}
      for req in self._queue:  # deque iteration preserves FIFO order
        buckets.setdefault(plan_of(req), []).append(req)
      self._plan_buckets = buckets
    buckets = self._plan_buckets
    chosen: list = []
    oldest = self._queue[0]
    if (self._starvation_age_s is not None
        and time.monotonic() - oldest.submitted_at
        > self._starvation_age_s):
      b = buckets[plan_of(oldest)]
      take = min(len(b), Bp, cap)
      chosen.extend(b[:take])
      del b[:take]
    for plan in sorted(
        (p for p in buckets if buckets[p]),
        key=lambda p: buckets[p][0].request_id):
      b = buckets[plan]
      while len(b) >= Bp and len(chosen) + Bp <= cap:
        chosen.extend(b[:Bp])
        del b[:Bp]
    oldest_id = min(r.request_id for r in self._queue)
    leftover = sorted(
        (p for p in buckets if buckets[p]),
        key=lambda p: (buckets[p][0].request_id != oldest_id,
                       -len(buckets[p])))
    for plan in leftover:
      if len(chosen) >= cap:
        break
      b = buckets[plan]
      take = min(len(b), cap - len(chosen))
      chosen.extend(b[:take])
      del b[:take]
    if not chosen:
      return
    for plan in [p for p, b in buckets.items() if not b]:
      del buckets[plan]
    chosen_ids = set(id(r) for r in chosen)
    self._queue = collections.deque(
        r for r in self._queue if id(r) not in chosen_ids)
    by_plan: dict = {}
    for si, req in zip(free, chosen):
      by_plan.setdefault(plan_of(req), []).append((si, req))
    pending = []
    for plan in sorted(by_plan):
      group = by_plan[plan]
      for g0 in range(0, len(group), Bp):
        part = group[g0:g0 + Bp]
        pending.append((part, self._prefill_group(part, *plan)))
    if defer_fetch and self._prefill_greedy and self._mesh is None:
      # Deferred resolution (step_chunk): mark the slots occupied now so
      # they join this chunk's decode; the first-token VALUES stay on
      # device (merged into the chunk's token input by _merge_first_fn)
      # and resolve with the chunk fetch — no dedicated admission
      # round-trip (measured ~36 ms/wave through the tunnel).
      for slot_reqs, _ in pending:
        for slot_idx, req in slot_reqs:
          slot = self._slots[slot_idx]
          slot.request = req
          slot.pos = req.prompt.size
          req.status = 'running'
          self._last_tokens[slot_idx, 0] = 0  # value arrives at resolve
      return pending
    self._finalize_admissions(pending)
    return []

  def _prefill_group(self, slot_reqs, num_chunks: int,
                     tail: bool = False):
    """Prefill up to prefill_batch requests in one batched pass per chunk.

    All rows share the chunk start (requests are grouped by chunk plan),
    so the DUS cache write position is one (4,) vector for the group.
    Chunked prompts thread each pass's output caches into the next pass,
    so any prompt up to max_prompt_len() prefills losslessly. With
    `tail`, the final partial chunk runs the short 'prefill_tail'
    program (prefill_tail_len positions) instead of a full-T pass.
    Returns the group's first tokens (greedy-head graphs) or last-row
    logits as a DEVICE array — the host sync happens once per admission
    wave, in _finalize_admissions.
    """
    cfg, T, Bp = self.cfg, self._prefill_len, self._prefill_batch
    Tt = self._prefill_tail_len
    tail_len = Tt if tail else 0
    n = len(slot_reqs)
    self.metrics['prefill_groups'] += 1
    self.metrics['prefill_pad_rows'] += Bp - n
    total_cap = num_chunks * T + tail_len
    tok_mat = np.zeros((Bp, total_cap), np.int32)
    for r, (_, req) in enumerate(slot_reqs):
      tok_mat[r, :req.prompt.size] = req.prompt
    # Each row's first-token position within the FINAL chunk (the only
    # head output admission consumes).
    last_start = num_chunks * T if tail else (num_chunks - 1) * T
    cols = np.zeros(Bp, np.int32)
    for r, (_, req) in enumerate(slot_reqs):
      cols[r] = (req.prompt.size - 1) - last_start
    head_cols_mode = bool(self.graph.metadata.get('prefill_head_cols'))
    if self._prefill_device_masks:
      # Production path: the whole group — chunk passes, pool scatter,
      # first-token gather — is ONE dispatch (_prefill_chain_for).
      group_ids = [si for si, _ in slot_reqs]
      if n < Bp:
        spares = [i for i in range(self.batch_slots) if i not in group_ids]
        group_ids = group_ids + spares[:Bp - n]
      valid = np.zeros(Bp, bool)
      valid[:n] = True
      fn = self._prefill_chain_for(num_chunks, tail)
      first, self._caches = fn(
          self._executor._weights, self._caches, tok_mat,
          jnp.asarray(cols), jnp.asarray(group_ids, jnp.int32),
          jnp.asarray(valid))
      return first, np.asarray(group_ids, np.int32), valid
    if not hasattr(self, '_prefill_zero_caches'):
      # Device-resident zero caches reused by every first chunk: shipping
      # 2L host-built zero arrays per admission costs tens of MB over the
      # host link (measured ~1.8 s/request through the axon tunnel).
      # Shapes/dtypes come from the PREFILL signature (float/int8 [.., H]
      # caches even when the decode pool is int4-packed).
      pre_sig = self.graph.signature_by_key('prefill')
      pre_sg = self.graph.subgraphs[pre_sig.subgraph_index]
      self._prefill_zero_caches = {}
      for li in range(cfg.num_layers):
        for kind in ('k', 'v'):
          key = f'layer_{li}_{kind}_cache_in'
          t = pre_sg.tensors[pre_sig.inputs[key]]
          dt = jnp.int8 if t.dtype == 'int8' else jnp.float32
          self._prefill_zero_caches[key] = jnp.zeros(t.shape, dt)
    chunk_caches = None
    out = None
    passes = [(c * T, T, self._prefill_fn) for c in range(num_chunks)]
    if tail:
      passes.append((num_chunks * T, Tt, self._prefill_tail_fn))
    for pi, (start, span, fn) in enumerate(passes):
      pos_row = np.arange(span, dtype=np.int32)
      inputs = {
          'tokens': tok_mat[:, start:start + span],
          'positions': np.broadcast_to(pos_row + start, (Bp, span)).copy(),
          'cache_pos': np.array([0, 0, start, 0], np.int32),
      }
      if head_cols_mode:
        # The in-graph head gathers ONE row per request; intermediate
        # chunks compute a 1-row head on garbage and it is ignored.
        inputs['head_cols'] = np.clip(cols, 0, span - 1).reshape(Bp, 1)
      if not self._prefill_device_masks:
        inputs['mask'] = self._host_prefill_mask(slot_reqs, start)
      inputs.update(chunk_caches if chunk_caches is not None
                    else self._prefill_zero_caches)
      out = fn(self._executor._weights, inputs)
      if pi + 1 < len(passes):
        chunk_caches = {
            f'layer_{li}_{kind}_cache_in': out[f'layer_{li}_{kind}_cache']
            for li in range(cfg.num_layers) for kind in ('k', 'v')
        }
    # Scatter the group's rows into the slot pool: ONE jitted call for all
    # layers and rows, at ONE program shape — partial groups pad slot_ids
    # with distinct spare slots (valid=False rows write back their own
    # content) so group size never triggers a recompile.
    new_rows = {
        f'layer_{li}_{kind}_cache_in': out[f'layer_{li}_{kind}_cache']
        for li in range(cfg.num_layers) for kind in ('k', 'v')
    }
    group_ids = [si for si, _ in slot_reqs]
    if n < Bp:
      spares = [i for i in range(self.batch_slots) if i not in group_ids]
      group_ids = group_ids + spares[:Bp - n]
    valid = np.zeros(Bp, bool)
    valid[:n] = True
    self._caches = self._slot_writer(
        self._caches, new_rows, jnp.asarray(group_ids, jnp.int32),
        jnp.asarray(valid))
    # Gather each row's last valid position ON DEVICE (padded to the fixed
    # prefill batch — one gather program); the wave-end fetch then carries
    # prefill_batch ids (greedy head) or vocab rows (host samplers). With
    # head_cols graphs the gather already happened in-graph.
    ids_arr = np.asarray(group_ids, np.int32)
    if head_cols_mode:
      first = (out['next_tokens'][:, 0] if self._prefill_greedy
               else out['logits'][:, 0])
      return first, ids_arr, valid
    rows_idx = jnp.arange(Bp)
    if self._prefill_greedy:
      return out['next_tokens'][rows_idx, jnp.asarray(cols)], ids_arr, valid
    return out['logits'][rows_idx, jnp.asarray(cols)], ids_arr, valid

  def _host_prefill_mask(self, slot_reqs, start: int) -> np.ndarray:
    """Host-built additive mask for graphs without prefill device masks:
    causal over positions, with each row's padded-key columns hidden."""
    cfg, T, Bp = self.cfg, self._prefill_len, self._prefill_batch
    G = cfg.num_query_heads // cfg.num_kv_heads
    S = cfg.max_seq_len
    mask = np.full((Bp, 1, G * T, S), -1e9, np.float32)
    for t in range(T):
      limit = start + t + 1
      for g in range(G):
        mask[:, :, g * T + t, :limit] = 0.0
    for r, (_, req) in enumerate(slot_reqs):
      if req.prompt.size < start + T:
        # Hide padded-key columns even from padded rows (garbage K values
        # must not leak into softmax numerics).
        mask[r, :, :, req.prompt.size:start + T] = -1e9
    return mask

  def _merge_first_fn(self):
    """Jitted scatter of one admission group's first tokens into the
    chunk's [B, 1] token input — all on device (deferred-fetch path).
    Padded rows carry DISTINCT spare slot ids with valid=False and write
    the slot's current token back, so one fixed-shape program covers any
    group size."""
    if not hasattr(self, '_merge_first_jit'):
      @jax.jit
      def merge(tokens, first, slot_ids, valid):
        cur = tokens[slot_ids, 0]
        vals = jnp.where(valid, first.astype(jnp.int32), cur)
        return tokens.at[slot_ids, 0].set(vals)
      self._merge_first_jit = merge
    return self._merge_first_jit

  def _resolve_admissions(self, pending, fetched) -> None:
    """Deferred-fetch bookkeeping: the admitted slots already decoded in
    the chunk that just ran; record their (piggybacked) first tokens.
    Done-at-prefill requests discard the chunk's surplus tokens exactly
    like mid-chunk completions."""
    for (slot_reqs, _), arr in zip(pending, fetched):
      for r, (slot_idx, req) in enumerate(slot_reqs):
        slot = self._slots[slot_idx]
        if slot.request is not req:  # cancelled/expired before resolve
          continue
        first_token = int(arr[r])
        req.generated.append(first_token)
        req.first_token_at = time.monotonic()
        ttft = req.first_token_at - req.submitted_at
        self.metrics['ttft_sum_s'] += ttft
        self.ttft_log.append(ttft)
        self.metrics['prefills'] += 1
        self.metrics['tokens_generated'] += 1
        self._last_tokens[slot_idx, 0] = first_token
        if (len(req.generated) >= req.max_new_tokens
            or req.prompt.size >= self.cfg.max_seq_len
            or (self._eos is not None and first_token == self._eos)):
          self._finish(req, 'done')
          slot.request = None
          self.metrics['requests_completed'] += 1

  def _finalize_admissions(self, pending) -> None:
    """One host sync for the whole admission wave, then bookkeeping."""
    if not pending:
      return
    fetched = jax.device_get([arr for _, (arr, _, _) in pending])
    for (slot_reqs, _), arr in zip(pending, fetched):
      for r, (slot_idx, req) in enumerate(slot_reqs):
        first_token = (int(arr[r]) if self._prefill_greedy
                       else self._sample(arr[r]))
        req.generated.append(first_token)
        req.status = 'running'
        req.first_token_at = time.monotonic()
        ttft = req.first_token_at - req.submitted_at
        self.metrics['ttft_sum_s'] += ttft
        self.ttft_log.append(ttft)
        self.metrics['prefills'] += 1
        self.metrics['tokens_generated'] += 1
        slot = self._slots[slot_idx]
        slot.request = req
        slot.pos = req.prompt.size
        self._last_tokens[slot_idx, 0] = first_token
        if (len(req.generated) >= req.max_new_tokens
            or slot.pos >= self.cfg.max_seq_len
            or (self._eos is not None and first_token == self._eos)):
          # Done at prefill: request satisfied (or cache full — no room
          # for a decode write) before any decode tick.
          self._finish(req, 'done')
          slot.request = None
          self.metrics['requests_completed'] += 1

  def _decode_inputs(self) -> dict:
    cfg = self.cfg
    B, S = self.batch_slots, self._bucket
    G = cfg.num_query_heads // cfg.num_kv_heads
    positions = np.zeros((B, 1), np.int32)
    for i, slot in enumerate(self._slots):
      if slot.active:
        positions[i, 0] = slot.pos
    inputs = {
        'tokens': self._last_tokens.copy(),
        'positions': positions,
    }
    if self.graph.metadata.get('decode_device_masks'):
      # Mask + one-hot derive from positions IN-GRAPH: only 2 tiny int32
      # arrays cross the host->device link per tick.
      return inputs
    onehot = np.zeros((B, 1, S, 1), np.float32)
    mask = np.full((B, 1, G, S), -1e9, np.float32)
    for i, slot in enumerate(self._slots):
      if not slot.active:
        continue
      onehot[i, 0, slot.pos, 0] = 1.0
      mask[i, :, :, :slot.pos + 1] = 0.0
    inputs['mask'] = mask
    inputs['cache_onehot'] = onehot
    return inputs
