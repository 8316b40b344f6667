"""Mixture-of-Experts feed-forward layer (pasero/models/mixture_of_experts.py).

Three implementations, selected by ``moe_impl``:
- 'basic': python loop over experts with dense masking (debugging, tiny E);
- 'fused': stacked expert weights + capacity-bounded dispatch einsums
  (mixture_of_experts.py:108-198 'fused' impl);
- 'sharded' (accepts the reference's name 'tutel'): same math with the expert
  axis annotated to the 'expert' mesh axis — GSPMD lowers the dispatch/combine
  einsums into the all-to-all over ICI that Tutel does with CUDA+NCCL
  (mixture_of_experts.py:201-310).

The load-balancing loss is sown into the 'losses' collection (picked up by the
trainer); gate statistics into 'gate_stats' (--moe-stats).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.moe import combine_tokens, dispatch_tokens, top2_gating
from .modules import ACTIVATIONS, default_kernel_init

Dtype = Any


def moe_expert_count(cfg, layer_id: int, is_decoder: bool) -> int:
    """Expert count for a layer, honoring per-layer ids / interval placement
    (mixture_of_experts.py:481-506); 0 = dense layer."""
    prefix = "decoder" if is_decoder else "encoder"
    count = getattr(cfg, f"{prefix}_expert_count", None)
    if not count:
        return 0
    if isinstance(count, dict):
        return int(count.get(layer_id, count.get(str(layer_id), 0)))
    layer_ids = getattr(cfg, f"{prefix}_expert_layer_ids", None)
    if layer_ids is not None:
        return count if layer_id in layer_ids else 0
    interval = getattr(cfg, f"{prefix}_expert_interval", 1) or 1
    return count if (layer_id + 1) % interval == 0 else 0


class MoEFeedForward(nn.Module):
    num_experts: int
    ffn_dim: int
    activation: str = "relu"
    use_bias: bool = True
    impl: str = "fused"             # 'basic' | 'fused' | 'sharded' | 'tutel'
    # token dispatch: 'gather' (scatter/gather reshuffle, O(T·D) — the
    # single-chip winner, PERFORMANCE.md MoE A/B), 'einsum' (one-hot
    # contractions that lower to the EP all-to-all under GSPMD), 'auto' =
    # gather for the single-chip impls, einsum for the sharded ones
    dispatch: str = "auto"
    capacity_factor: float = 0.0
    load_balancing: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic: bool = True):
        """x: (B, S, D); pad_mask: (B, S) True at real tokens."""
        B, S, D = x.shape
        E = self.num_experts
        expert_axis = "expert" if self.impl in ("sharded", "tutel") else None

        gate_w = self.param(
            "gate", nn.with_logical_partitioning(default_kernel_init,
                                                 ("embed", None)),
            (D, E), jnp.float32)
        w_in = self.param(
            "experts_in",
            nn.with_logical_partitioning(default_kernel_init,
                                         (expert_axis, "embed", "mlp")),
            (E, D, self.ffn_dim), jnp.float32)
        w_out = self.param(
            "experts_out",
            nn.with_logical_partitioning(default_kernel_init,
                                         (expert_axis, "mlp", "embed")),
            (E, self.ffn_dim, D), jnp.float32)
        if self.use_bias:
            b_in = self.param(
                "experts_in_bias",
                nn.with_logical_partitioning(nn.initializers.zeros,
                                             (expert_axis, "mlp")),
                (E, self.ffn_dim), jnp.float32)
            b_out = self.param(
                "experts_out_bias",
                nn.with_logical_partitioning(nn.initializers.zeros,
                                             (expert_axis, "embed")),
                (E, D), jnp.float32)

        act = ACTIVATIONS.get(self.activation, jax.nn.relu)
        tokens = x.reshape(B * S, D)
        flat_mask = pad_mask.reshape(B * S) if pad_mask is not None else None
        logits = jnp.dot(tokens.astype(jnp.float32), gate_w)   # fp32 router

        if self.impl == "basic":
            gates = jax.nn.softmax(logits, axis=-1)
            if flat_mask is not None:
                gates = gates * flat_mask[:, None]
            top2 = jax.lax.top_k(gates, 2)[0]
            norm = jnp.maximum(top2.sum(-1, keepdims=True), 1e-9)
            kth = top2[:, -1:]
            weights = jnp.where(gates >= kth, gates, 0.0) / norm
            out = jnp.zeros_like(tokens, dtype=jnp.float32)
            for e in range(E):  # dense loop (small E only)
                h = act(jnp.dot(tokens.astype(self.dtype),
                                w_in[e].astype(self.dtype))
                        + (b_in[e].astype(self.dtype) if self.use_bias else 0))
                y = jnp.dot(h, w_out[e].astype(self.dtype)) \
                    + (b_out[e].astype(self.dtype) if self.use_bias else 0)
                out = out + weights[:, e:e + 1] * y.astype(jnp.float32)
            me = gates.mean(0)
            ce = jax.nn.one_hot(jnp.argmax(gates, -1), E).mean(0)
            aux = E * jnp.sum(me * ce)
            self._sow_losses(aux, {"mean_gate": me, "top1_share": ce,
                                   "load": ce * tokens.shape[0]})
            return out.reshape(B, S, D).astype(self.dtype)

        gated = self.activation in ("swiglu", "geglu")
        if gated:  # Mixtral-style experts: act(gate(x)) * up(x)
            w_gate = self.param(
                "experts_gate",
                nn.with_logical_partitioning(default_kernel_init,
                                             (expert_axis, "embed", "mlp")),
                (E, D, self.ffn_dim), jnp.float32)

        use_gather = (self.dispatch == "gather"
                      or (self.dispatch == "auto"
                          and self.impl in ("basic", "fused")))
        gating = top2_gating(logits, pad_mask=flat_mask,
                             capacity_factor=self.capacity_factor,
                             compact=use_gather)
        C = gating["capacity"]
        if use_gather:
            from ..ops.moe import dispatch_tokens_gather
            expert_in = dispatch_tokens_gather(
                tokens.astype(self.dtype), gating["routing"], E, C)
        else:
            expert_in = dispatch_tokens(tokens.astype(self.dtype),
                                        gating["dispatch"])  # (E, C, D)
        h = jnp.einsum("ecd,edf->ecf", expert_in, w_in.astype(self.dtype),
                       preferred_element_type=self.dtype)
        if self.use_bias:
            h = h + b_in[:, None, :].astype(self.dtype)
        if gated:
            g = jnp.einsum("ecd,edf->ecf", expert_in, w_gate.astype(self.dtype),
                           preferred_element_type=self.dtype)
            gate_act = jax.nn.silu if self.activation == "swiglu" else jax.nn.gelu
            h = gate_act(g) * h
        else:
            h = act(h)
        expert_out = jnp.einsum("ecf,efd->ecd", h, w_out.astype(self.dtype),
                                preferred_element_type=self.dtype)
        if self.use_bias:
            expert_out = expert_out + b_out[:, None, :].astype(self.dtype)
        if use_gather:
            from ..ops.moe import combine_tokens_gather
            out = combine_tokens_gather(expert_out, gating["routing"])
        else:
            out = combine_tokens(expert_out, gating["combine"])
        self._sow_losses(gating["aux_loss"], gating["stats"])
        return out.reshape(B, S, D).astype(self.dtype)

    def _sow_losses(self, aux_loss, stats):
        if self.load_balancing:
            self.sow("losses", "load_balancing",
                     aux_loss * self.load_balancing,
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)
        self.sow("gate_stats", "stats", stats,
                 reduce_fn=lambda a, b: b, init_fn=dict)
