"""Expert parallelism (EP) for quantized Mixture-of-Experts FFNs.

The 'ep' mesh axis shards the EXPERT dimension: each device holds E/ep
experts' integer weights (int8/int4-valued, per-channel scales sharded
congruently along the expert dim), computes the gated contribution of its
local experts for every token, and one psum over 'ep' combines — the
dense-dispatch MoE schedule. It moves activations once (the [B, D] psum)
instead of ever gathering expert weights, so the 4-8x integer weight
compression multiplies directly into per-device HBM capacity: ep * chips
hold ep times the experts.

Top-k routing (k=2 default) runs replicated on the router logits; non-top
experts contribute zero, so local experts whose gate is zero for every
token are dead code XLA can skip per tile. For capacity-bound production
dispatch (all_to_all of token shards), this module's combine semantics
are the correctness oracle.

No reference counterpart (SURVEY.md §2.6: the reference has no
parallelism); this is a north-star subsystem ('ep' in tp/pp/dp/sp/ep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def topk_gates(router_logits: jax.Array, k: int = 2) -> jax.Array:
  """[B, E] logits -> [B, E] gate weights: softmax over the top-k entries
  per token, zero elsewhere (renormalized top-k routing)."""
  top_vals, _ = jax.lax.top_k(router_logits, k)
  thresh = top_vals[:, k - 1:k]
  masked = jnp.where(router_logits >= thresh, router_logits, -jnp.inf)
  return jax.nn.softmax(masked, axis=-1)


def _expert_ffn(x, wg, sg, wu, su, wd, sd):
  """One expert's GeGLU FFN with integer weights dequantized in-compute.

  x [B, D]; wg/wu int [F, D] scales [F]; wd int [D, F] scales [D].
  """
  compute = x.dtype
  gate = jax.lax.dot_general(
      x, wg.astype(compute), dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32) * sg.astype(jnp.float32)
  up = jax.lax.dot_general(
      x, wu.astype(compute), dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32) * su.astype(jnp.float32)
  hidden = (jax.nn.gelu(gate, approximate=True) * up).astype(compute)
  down = jax.lax.dot_general(
      hidden, wd.astype(compute),
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32) * sd.astype(jnp.float32)
  return down


def moe_ffn_local(x, gates, wg, sg, wu, su, wd, sd,
                  axis_name: str = 'ep') -> jax.Array:
  """Per-device body (call under shard_map over `axis_name`).

  x [B, D] replicated tokens; gates [B, E] replicated top-k gate weights;
  w*/s* hold THIS device's E/ep experts (leading dim E_local).
  Returns [B, D] combined over all experts (psum over the ep axis).
  """
  my = jax.lax.axis_index(axis_name)
  e_local = wg.shape[0]
  y = jnp.zeros((x.shape[0], wd.shape[1]), jnp.float32)
  for e in range(e_local):
    g = gates[:, my * e_local + e][:, None]  # [B, 1] this expert's gate
    y = y + g * _expert_ffn(x, wg[e], sg[e], wu[e], su[e], wd[e], sd[e])
  return jax.lax.psum(y, axis_name)


def make_moe_ffn(mesh: Mesh, axis_name: str = 'ep', k: int = 2):
  """jitted f(x, router_w, wg, sg, wu, su, wd, sd) -> [B, D].

  Expert-dim-leading weights must be placed with P('ep', ...) (expert
  shards never split a packed byte or a scale vector). router_w [E, D]
  int8 with scales folded (or f32) stays replicated.
  """
  def fn(x, router_logits, wg, sg, wu, su, wd, sd):
    gates = topk_gates(router_logits.astype(jnp.float32), k)
    body = functools.partial(moe_ffn_local, axis_name=axis_name)
    in_specs = (P(), P(), P(axis_name), P(axis_name), P(axis_name),
                P(axis_name), P(axis_name), P(axis_name))
    if hasattr(jax, 'shard_map'):
      sharded = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                              out_specs=P(), check_vma=False)
    else:  # pragma: no cover - legacy API
      from jax.experimental.shard_map import shard_map
      sharded = shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=P(), check_rep=False)
    return sharded(x, gates, wg, sg, wu, su, wd, sd)

  return jax.jit(fn)


def moe_ffn_reference(x, router_logits, wg, sg, wu, su, wd, sd,
                      k: int = 2) -> jax.Array:
  """Unsharded oracle: dense top-k MoE combine."""
  gates = topk_gates(router_logits.astype(jnp.float32), k)
  e = wg.shape[0]
  y = jnp.zeros((x.shape[0], wd.shape[1]), jnp.float32)
  for i in range(e):
    y = y + gates[:, i][:, None] * _expert_ffn(
        x, wg[i], sg[i], wu[i], su[i], wd[i], sd[i])
  return y
