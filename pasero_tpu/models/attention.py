"""Multi-head attention with GQA/MQA, RoPE, additive biases, and a KV cache.

TPU-native equivalent of pasero/models/modules.py:487-771. Differences by
design:

- the KV cache is a fixed-size buffer in a flax ``cache`` collection, written
  with ``dynamic_update_slice`` at a scalar step index (static shapes for XLA;
  the reference grows tensors dynamically, modules.py:621-641);
- prompts are LEFT-padded at decode time so every row is aligned at the write
  position; per-sample position offsets feed RoPE/ALiBi (the reference keeps
  per-sample offsets too, modules.py:996-1013);
- masks are boolean (True = attend) and biases additive float32, combined once
  before the softmax; the causal/sliding-window structure is computed from
  position indices instead of growing cached mask buffers (modules.py:664-674);
- kernels selected by ``kernel``: 'auto' (default — XLA fused softmax for
  short sequences, the Pallas flash kernel when the score matrix would be
  memory-bound), 'xla' (supports returned weights + attention dropout),
  'flash' (pasero_tpu/ops/flash_attention.py), or 'ring' (context
  parallelism over the 'seq' mesh axis, pasero_tpu/parallel/context.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Linear
from .positional import apply_rope

Dtype = Any

NEG_INF = -1e9  # large finite value: safe for padded rows (softmax of all -1e9 is uniform, masked later)

def lineage_attention(q, k_cache, v_cache, lineage, mask=None, bias=None,
                      scale=1.0):
    """Beam-search decode attention WITHOUT cache reordering.

    Instead of permuting the KV cache to follow beam reorders every step
    (reference decoding.py:1609; the dominant HBM traffic of beam decode),
    the cache rows stay where they were written and ``lineage[b, k, s]``
    names the physical row (within sentence b's K-row block) that holds
    logical beam k's key/value at slot s.  Scores are computed against ALL
    K physical rows — K× more QK^T/AV FLOPs on the otherwise-idle MXU —
    and the right lineage is selected on the (small, fp32) score matrix
    with a one-hot einsum, eliminating the (B·K, H, S, D) cache
    permute read+write entirely.

    The selection is folded into the attention mask: slot (p, l) of the
    combined (P*L)-long key axis is attendable by logical beam k iff
    ``lineage[b, k, l] == p`` (and the kv mask allows l), so one masked
    softmax over (P, L) replaces explicit per-slot selection.

    Layout is the whole game here: every einsum touching the CACHE keeps
    its batch dims (b, p, h) adjacent and in cache order, so XLA contracts
    (B*K, H, L, D) cache buffers as-is.  A formulation with (b, h) split
    around the beam axis forces a per-step cache relayout, which also
    breaks the in-place `dynamic_update_slice` of the cache write — the
    resulting full-cache copies were ~7 of the 11 ms/call this path cost
    before (profiled on a v5e chip).  Only q/bias/weights (KB-to-few-MB
    tensors) get transposed.

    q: (B*K, H, 1, D); k_cache/v_cache: (B*K, H, L, D);
    lineage: (B, K, L) int32; mask: bool (B*K, 1, 1, L);
    bias: float (B*K, H|1, 1, L).  Returns (B*K, H, 1, D).
    """
    B, K, L = lineage.shape
    H, D = q.shape[1], q.shape[-1]
    kb = k_cache.reshape(B, K, H, L, D)          # physical rows p == dim 1
    vb = v_cache.reshape(B, K, H, L, D)
    # q arranged (B, 1->P, H, K_logical, D): tiny, transpose is free
    qb = q.reshape(B, K, H, D).transpose(0, 2, 1, 3)[:, None]
    # scores[b, p, h, k, l] — batch dims (b, p, h) match the cache layout
    scores = jnp.einsum("bphkd,bphld->bphkl",
                        jnp.broadcast_to(qb, (B, K, H, K, D)), kb,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        # bias depends only on the slot l, not the physical row
        bias_t = bias.reshape(B, K, bias.shape[1], L).transpose(0, 2, 1, 3)
        scores = scores + bias_t[:, None].astype(jnp.float32)
    # (B, P, 1, K, L) True where physical row p holds beam k's slot l
    sel = lineage[:, None, :, :] == jnp.arange(K)[None, :, None, None]
    if mask is not None:
        sel = sel & mask.reshape(B, K, L)[:, None, :, :]  # per logical beam k
    scores = jnp.where(sel[:, :, None], scores, NEG_INF)
    # joint softmax over the (p, l) axes without flattening (no reshapes
    # of the big tensor)
    m = jnp.max(scores, axis=(1, 4), keepdims=True)
    e = jnp.exp(scores - m)
    weights = e / jnp.sum(e, axis=(1, 4), keepdims=True)
    # per-physical-row partial outputs, then a cheap reduction over p:
    # non-selected (p, l) weights are exactly zero, so the sum is exact
    out_p = jnp.einsum("bphkl,bphld->bphkd", weights.astype(vb.dtype), vb)
    out = out_p.sum(axis=1).transpose(0, 2, 1, 3)    # (B, K, H, D)
    return out.reshape(B * K, H, 1, D)


def dot_product_attention(q, k, v, mask=None, bias=None, scale=1.0,
                          dropout_rate=0.0, dropout_rng=None,
                          return_weights=False):
    """Plain XLA attention. q: (B,H,Sq,D), k/v: (B,H,Sk,D).
    mask: bool (B,1|H,Sq,Sk) True=attend; bias: float (B,1|H,Sq,Sk)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
    if return_weights:
        return out, weights
    return out


class MultiheadAttention(nn.Module):
    num_heads: int
    kv_heads: Optional[int] = None
    use_bias: bool = True
    key_bias: bool = True
    scale_attn: bool = True
    max_qkv: Optional[float] = None
    sliding_window: Optional[int] = None
    rope_base: Optional[float] = None        # set => apply RoPE to q/k
    dropout: float = 0.0
    causal: bool = False
    cross_attention: bool = False
    cache_len: int = 0                       # >0 enables the decode KV cache
    kernel: str = "auto"                     # auto | xla | flash | ring
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x_q: jnp.ndarray,                    # (B, Sq, E)
        x_kv: Optional[jnp.ndarray] = None,  # (B, Sk, E) for cross-attention
        mask: Optional[jnp.ndarray] = None,  # bool (B, 1, Sq, Sk) True=attend
        bias: Optional[jnp.ndarray] = None,  # float (B, H|1, Sq, Sk)
        positions: Optional[jnp.ndarray] = None,  # (B, Sq) absolute positions
        kv_positions: Optional[jnp.ndarray] = None,
        decode: bool = False,
        deterministic: bool = True,
        return_weights: bool = False,
        beam_lineage: Optional[jnp.ndarray] = None,  # (B0, K, cache_len) int32
    ):
        embed_dim = x_q.shape[-1]
        num_heads = self.num_heads
        kv_heads = self.kv_heads or num_heads
        head_dim = embed_dim // num_heads
        x_kv = x_q if x_kv is None else x_kv
        B, Sq = x_q.shape[:2]

        q = Linear(num_heads * head_dim, use_bias=self.use_bias, dtype=self.dtype,
                   kernel_axes=("embed", "heads"), name="q_proj")(x_q)
        k = Linear(kv_heads * head_dim, use_bias=self.use_bias and self.key_bias,
                   dtype=self.dtype, kernel_axes=("embed", "heads"),
                   name="k_proj")(x_kv)
        v = Linear(kv_heads * head_dim, use_bias=self.use_bias, dtype=self.dtype,
                   kernel_axes=("embed", "heads"), name="v_proj")(x_kv)

        q = q.reshape(B, Sq, num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, x_kv.shape[1], kv_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, x_kv.shape[1], kv_heads, head_dim).transpose(0, 2, 1, 3)

        if self.max_qkv is not None:  # MPT-65k stability clamp (modules.py:513-514)
            q = jnp.clip(q, -self.max_qkv, self.max_qkv)
            k = jnp.clip(k, -self.max_qkv, self.max_qkv)
            v = jnp.clip(v, -self.max_qkv, self.max_qkv)

        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(Sq)[None], (B, Sq))
        if kv_positions is None:
            kv_positions = positions if not self.cross_attention else \
                jnp.broadcast_to(jnp.arange(x_kv.shape[1])[None], (B, x_kv.shape[1]))

        if self.rope_base is not None and not self.cross_attention:
            q = apply_rope(q, positions, self.rope_base)
            k = apply_rope(k, kv_positions, self.rope_base)

        # a T5Bias carries the (num_buckets, H) table instead of a
        # materialized bias: the flash kernels compute it blockwise; every
        # other path materializes it here from the call's positions
        from ..ops.flash_attention import T5Bias
        t5 = None
        if isinstance(bias, T5Bias):
            t5, bias = bias, None

        def materialize_t5():
            from .positional import t5_bias_from_table
            return t5_bias_from_table(t5.table, positions, kv_positions,
                                      t5.bidirectional, t5.num_buckets,
                                      t5.max_distance)

        if t5 is not None and (decode or return_weights):
            bias, t5 = materialize_t5(), None

        if decode and self.cache_len > 0:
            k, v, kv_positions, mask, bias = self._update_cache(
                k, v, kv_positions, positions, mask, bias,
                fusable=beam_lineage is not None)

        scale = head_dim ** -0.5 if self.scale_attn else 1.0

        if (beam_lineage is not None and decode and self.cache_len > 0
                and not self.cross_attention):
            # XLA formulation, deliberately: two Pallas variants (grids
            # (B, H) and (B,) with static head/row loops) measured 6.1-6.8
            # ms/call vs 3.7 here on v5e — per-program overhead and (K, L)
            # sub-tile VPU work swamp the saved HBM round trips at decode's
            # tiny shapes (see PERFORMANCE.md, round-3 notes)
            if kv_heads != num_heads:
                k = jnp.repeat(k, num_heads // kv_heads, axis=1)
                v = jnp.repeat(v, num_heads // kv_heads, axis=1)
            out = lineage_attention(q, k, v, beam_lineage, mask=mask,
                                    bias=bias, scale=scale)
            out = out.transpose(0, 2, 1, 3).reshape(B, Sq, num_heads * head_dim)
            return Linear(embed_dim, use_bias=self.use_bias, dtype=self.dtype,
                          kernel_axes=("heads", "embed"), name="out_proj")(out)

        # context parallelism: full-forward self-attention rides the 'seq'
        # mesh axis via ring attention (causal/window applied from global
        # slot indices inside the ring; K/V stay GQA-sized on the wire)
        use_ring = (self.kernel == "ring" and not decode
                    and not return_weights and not self.cross_attention)
        if use_ring:
            ring_dropout_rng = None
            if self.dropout > 0 and not deterministic:
                # per-(q-block, k-block) keyed dropout inside the ring step
                # (ops/ring_attention.py) — matches single-device
                # dropout(softmax) semantics in distribution
                ring_dropout_rng = self.make_rng("dropout")
            from ..parallel.context import ring_self_attention
            kv_mask = mask[:, 0, 0, :] if mask is not None else None
            if t5 is not None:
                bias, t5 = materialize_t5(), None
            out = ring_self_attention(q, k, v, kv_mask=kv_mask, bias=bias,
                                      scale=scale, causal=self.causal,
                                      window=self.sliding_window,
                                      dropout_rate=self.dropout,
                                      dropout_rng=ring_dropout_rng)
            out = out.transpose(0, 2, 1, 3).reshape(B, Sq, num_heads * head_dim)
            out = Linear(embed_dim, use_bias=self.use_bias, dtype=self.dtype,
                         kernel_axes=("heads", "embed"), name="out_proj")(out)
            return out

        dropout_rng = None
        if self.dropout > 0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        kernel = self.kernel
        if kernel == "auto":
            # the Pallas flash kernel never materializes the (Sq, Sk) score
            # matrix: at long lengths the XLA path runs out of HBM (measured:
            # S=8192 B=4 H=8 OOMs on a 16G chip, flash runs in 104 ms), so
            # from 4096 up flash is unconditional (bias or not).
            # In the bias-free GQA regime the round-4 group-packed kernels
            # (one program per (batch, KV head), M = group*BQ MXU rows)
            # win end-to-end from much shorter sequences: llama_1b training
            # at S=2048 measured 7.9k tok/s with XLA attention vs 15.7k
            # with flash (the round-3 6%-slower reading predates the packed
            # layout), so auto now picks flash for grouped heads at S>=1024.
            # Dense (group=1) keeps the conservative 4096 switch: its
            # end-to-end win is unproven below that (transformer-base at
            # S=128 measured faster on XLA).
            long_seq = q.shape[2] * k.shape[2] >= 4096 * 4096
            grouped = (self.kv_heads or self.num_heads) < self.num_heads
            gqa_win = (grouped and bias is None and t5 is None
                       and q.shape[2] * k.shape[2] >= 1024 * 1024)
            kernel = ("flash" if (long_seq or gqa_win) and dropout_rng is None
                      else "xla")
        # flash has no attention-dropout path; fall back when dropout is live
        use_flash = (kernel == "flash" and not return_weights and not decode
                     and dropout_rng is None)

        # causal / sliding-window structure from positions (no cached masks);
        # the flash kernel applies causality/window from slot indices itself,
        # so it keeps the cheap key-padding mask instead of a (Sq, Sk) one
        if self.causal and not decode and not use_flash:
            causal = kv_positions[:, None, None, :] <= positions[:, None, :, None]
            if self.sliding_window:
                causal &= (positions[:, None, :, None] - kv_positions[:, None, None, :]
                           ) < self.sliding_window
            mask = causal if mask is None else (mask & causal)

        if use_flash:
            from ..ops.flash_attention import flash_attention
            # GQA-sized K/V go in directly (the kernel indexes heads)
            out = flash_attention(q, k, v, mask=mask, bias=bias, scale=scale,
                                  causal=self.causal,
                                  window=self.sliding_window, t5_bias=t5)
            weights = None
        else:
            if t5 is not None:
                bias, t5 = materialize_t5(), None
            if kv_heads != num_heads:
                k = jnp.repeat(k, num_heads // kv_heads, axis=1)
                v = jnp.repeat(v, num_heads // kv_heads, axis=1)
            result = dot_product_attention(
                q, k, v, mask=mask, bias=bias, scale=scale,
                dropout_rate=self.dropout if not deterministic else 0.0,
                dropout_rng=dropout_rng, return_weights=return_weights)
            out, weights = result if return_weights else (result, None)

        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, num_heads * head_dim)
        out = Linear(embed_dim, use_bias=self.use_bias, dtype=self.dtype,
                     kernel_axes=("heads", "embed"), name="out_proj")(out)
        if return_weights:
            return out, weights
        return out

    def _update_cache(self, k, v, kv_positions, positions, mask, bias,
                      fusable=False):
        """Fixed-size ring-free cache: write current K/V at the step index.

        Self-attention: append k/v at index, attend over [0, index+Sq).
        Cross-attention: store encoder K/V once, reuse afterwards.
        ``fusable``: prefer an elementwise select write over
        dynamic_update_slice (see comment at the write site).
        """
        B, H, Sk, D = k.shape
        cached_k = self.variable("cache", "cached_key",
                                 jnp.zeros, (B, H, self.cache_len, D), self.dtype)
        cached_v = self.variable("cache", "cached_value",
                                 jnp.zeros, (B, H, self.cache_len, D), self.dtype)
        index = self.variable("cache", "cache_index",
                              lambda: jnp.zeros((), jnp.int32))
        if self.cross_attention:
            filled = self.variable("cache", "cross_filled",
                                   lambda: jnp.zeros((), jnp.bool_))
            # store once (first call writes, later calls reuse)
            new_k = jnp.where(filled.value, cached_k.value,
                              jax.lax.dynamic_update_slice(
                                  cached_k.value, k, (0, 0, 0, 0)))
            new_v = jnp.where(filled.value, cached_v.value,
                              jax.lax.dynamic_update_slice(
                                  cached_v.value, v, (0, 0, 0, 0)))
            cached_k.value, cached_v.value = new_k, new_v
            filled.value = jnp.ones((), jnp.bool_)
            kv_pos = jnp.broadcast_to(jnp.arange(self.cache_len)[None],
                                      (B, self.cache_len))
            # mask/bias were computed for the raw encoder length; pad to cache_len
            if mask is not None and mask.shape[-1] < self.cache_len:
                pad = self.cache_len - mask.shape[-1]
                mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, pad)))
            if bias is not None and bias.shape[-1] < self.cache_len:
                pad = self.cache_len - bias.shape[-1]
                bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pad)),
                               constant_values=NEG_INF)
            return new_k, new_v, kv_pos, mask, bias

        i = index.value
        if fusable and Sk == 1:
            # aliased in-place Pallas slot write (ops/cache_update.py): the
            # cache buffer is reused, only the target slot is touched, and
            # the alias chain lets XLA elide the while-carry copies that a
            # functional update forces (~0.56 ms/step of buffer copies +
            # a full-cache streaming pass, profiled on v5e)
            from ..ops.cache_update import cache_slot_write
            cached_k.value = cache_slot_write(cached_k.value, k, i)
            cached_v.value = cache_slot_write(cached_v.value, v, i)
        else:
            cached_k.value = jax.lax.dynamic_update_slice(
                cached_k.value, k, (0, 0, i, 0))
            cached_v.value = jax.lax.dynamic_update_slice(
                cached_v.value, v, (0, 0, i, 0))
        index.value = i + Sk
        # callers size their kv mask/bias for the tokens they will decode;
        # the cache may be longer (e.g. one buffer shared between greedy and
        # speculative decode) — pad to cache_len, the `valid` written-slot
        # mask below gates whatever the caller did not cover
        if mask is not None and mask.shape[-1] < self.cache_len:
            pad = self.cache_len - mask.shape[-1]
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, pad)),
                           constant_values=True)
        if bias is not None and bias.shape[-1] < self.cache_len:
            pad = self.cache_len - bias.shape[-1]
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pad)))
        slots = jnp.arange(self.cache_len)
        valid = slots[None, :] < (i + Sk)                       # (1, L)
        kv_pos = positions[:, -1:] - (i + Sk - 1) + slots[None]  # (B, L) absolute
        causal = kv_pos[:, None, None, :] <= positions[:, None, :, None]
        attend = causal & valid[:, None, None, :]
        if self.sliding_window:
            attend &= (positions[:, None, :, None] - kv_pos[:, None, None, :]
                       ) < self.sliding_window
        mask = attend if mask is None else (mask & attend)
        return cached_k.value, cached_v.value, kv_pos, mask, bias
